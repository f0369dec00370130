package graft

import scala.collection.mutable
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
    // (the r9 TSV carried a no_pushdown_filter column hard-coded to 0,
    // which read as "pushdown verified clean" — dropped; per-query
    // pushdown is pinned in PlanSpec where it matters)
    sb.append("query\texch_hash\texch_range\texch_rr\texch_single\tbcast\tsmj\tshj\tbhj\tbnlj\tcartesian\twindows\tglobal_window\tgenerate\tscans\tsort\n")
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
        // global ⟺ no arg lacking an ASC/DESC marker. The r9 regex
        // ([^)]* — stopped at the first ')') misparsed specs whose
        // ordering expressions contain parens; extract each spec's full
        // argument list with balanced-paren matching instead, and split
        // its top-level commas only (depth 0).
        val winLines = plan.linesIterator.filter(_.trim.matches("^[+\\-:* ]*Window(Group)?(Limit)? \\[.*")).toSeq
        val win = winLines.size
        def balancedSpecs(s: String): Seq[String] = {
          val marker = "windowspecdefinition("
          val out = mutable.ArrayBuffer[String]()
          var from = s.indexOf(marker)
          while (from >= 0) {
            var i = from + marker.length
            var depth = 1
            val sb2 = new StringBuilder
            while (depth > 0 && i < s.length) {
              val c = s.charAt(i)
              if (c == '(') depth += 1
              else if (c == ')') depth -= 1
              if (depth > 0) sb2.append(c)
              i += 1
            }
            out += sb2.toString
            from = s.indexOf(marker, i)
          }
          out.toSeq
        }
        def topLevelArgs(s: String): Seq[String] = {
          val out = mutable.ArrayBuffer[String]()
          var depth = 0
          val cur = new StringBuilder
          s.foreach {
            case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
            case c =>
              if (c == '(') depth += 1 else if (c == ')') depth -= 1
              cur.append(c)
          }
          if (cur.nonEmpty) out += cur.toString.trim
          out.toSeq.filter(_.nonEmpty)
        }
        val globalWin = balancedSpecs(plan).count { spec =>
          val items = topLevelArgs(spec)
            .filterNot(_.startsWith("specifiedwindowframe"))
          items.forall(it => it.endsWith(" ASC NULLS FIRST") ||
            it.endsWith(" ASC NULLS LAST") || it.endsWith(" DESC NULLS FIRST") ||
            it.endsWith(" DESC NULLS LAST"))
        }
        val gen = c("Generate ")
        val scans = c("FileScan parquet") + c("Scan parquet")
        val sorts = c("Sort ")
        s"${d.name}\t$hashEx\t$rangeEx\t$rrEx\t$singleEx\t$bcast\t$smj\t$shj\t$bhj\t$bnlj\t$cart\t$win\t$globalWin\t$gen\t$scans\t$sorts"
      } catch { case e: Throwable => s"${d.name}\tPLAN_FAILED: ${e.getMessage.take(80)}" }
      sb.append(row).append('\n')
      spark.catalog.clearCache()
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"[audit] ${graft.queries.Registry.all.size} queries -> $out")
    spark.stop()
  }
}
