package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode

/** Ad-hoc plan dump for optimization evidence: writes the FORMATTED
  * physical plan of each named registry query to `<outDir>/<name><suffix>.txt`.
  *
  * Names may also address PRE-CHECKPOINT handles (the inner DataFrame a
  * query materializes before a `localCheckpoint` truncates its lineage)
  * via the `inner` map — the r9 lesson (VERDICT r9 #2/#6): a
  * post-checkpoint dump shows only the 4-node Sort/Exchange/ExistingRDD
  * tail and proves nothing about the build it hides.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <name,name,...>
  * Never part of the driver contract; purely a local optimization aid.
  */
object PlanDump {
  /** pre-checkpoint handles: label -> builder of the inner frame */
  val inner: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_calibrator_shifts_inner" ->
      ((s, dir) => graft.queries.Physics.q42Inner(s, dir)),
    "q183_prototypicality_prune_inner" ->
      ((s, dir) => graft.operators.Similarity.prototypicalityRanked(
        graft.core.Tables.load(s, dir, "embeddings"), hardest = true,
        cellCol = "label", idCol = "vec_id", vecCol = "embedding")))

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args(3).split(",").filter(_.nonEmpty).toSeq
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
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = inner.get(n).map(f => f(spark, sfDir))
        .getOrElse(graft.queries.Registry.queries(n)(spark, sfDir))
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/$n$suffix.txt"), plan)
      println(s"[plandump] $n -> $outDir/$n$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
