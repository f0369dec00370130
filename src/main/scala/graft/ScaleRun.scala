package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Named 100×-scale runs of composites whose DuckDB oracles are
  * all-pairs by design (rehearsal-excluded), so the Spark side needs its
  * own recorded timing + plan shape (VERDICT r8 #4/#5). Results →
  * SCALE.md. Usage: runMain graft.ScaleRun <case> <dataDir>
  *
  *  - `communities`: the q193 composite on its SCALE scorer — cellTopK
  *    (IVF cells = the label coarse quantizer, every vector a query) →
  *    mutual-kNN filter → 3 label-propagation rounds, end-to-end.
  *  - `ccsampled`: q200's wedge-sampling clustering coefficient (k=16,
  *    xxhash64 production draws) on the q133 co-order part graph.
  */
object ScaleRun {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleRun <communities|ccsampled> <dataDir>")
    val (what, dir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // NOTE: iterative composites (labelPropagation) materialize eagerly
    // inside their loop, so the WHOLE case is timed — not just the final
    // count. Plan-shape counts come from the (unexecuted) scorer plan
    // string, costing nothing extra.
    def planCounts(df: org.apache.spark.sql.DataFrame): String = {
      val p = df.queryExecution.executedPlan.toString
      def c(s: String) = p.split("\n").count(_.contains(s))
      s"plan[SMJ=${c("SortMergeJoin")} BHJ=${c("BroadcastHashJoin")} " +
        s"SHJ=${c("ShuffledHashJoin")} exch=${c("Exchange ")} window=${c("WindowExec")}]"
    }

    val t0 = System.nanoTime()
    what match {
      case "communities" =>
        val emb = graft.core.Tables.load(spark, dir, "embeddings")
        val queries = emb.select(col("vec_id").as("qid"),
          col("embedding").as("qvec"), col("label").as("qcell"))
        val top = graft.operators.Similarity.cellTopK(
          emb, queries, k = 3, cell = "label", qcell = "qcell",
          scanParallelism = spark.sparkContext.defaultParallelism * 8)
        val edges = graft.operators.Similarity.mutualKnnEdges(top)
        val n = graft.operators.Graph.labelPropagation(edges, iterations = 3).count()
        println(f"[scale-run] communities rows=$n%d  wall=${(System.nanoTime() - t0) / 1e9}%.1f s  scorer ${planCounts(top)}")
      case "ccsampled" =>
        val li = graft.core.Tables.load(spark, dir, "lineitem")
        val a = li.select(col("l_orderkey").as("k"), col("l_partkey").as("a"))
        val b = li.select(col("l_orderkey").as("k"), col("l_partkey").as("b"))
        val edges = a.join(b, "k").filter(col("a") < col("b"))
          .select(col("a"), col("b")).distinct()
        val cc = graft.operators.Graph.clusteringCoefficientSampled(edges,
          samplesPerVertex = 16)
        val n = cc.count()
        println(f"[scale-run] ccsampled rows=$n%d  wall=${(System.nanoTime() - t0) / 1e9}%.1f s  ${planCounts(cc)}")
      case other => sys.error(s"unknown case: $other")
    }
    spark.stop()
  }
}
