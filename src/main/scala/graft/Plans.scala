package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan dump for scale rehearsals: writes the FORMATTED physical plan of
  * every bench-flagged registry query at the given sfDir, so plans at two
  * scale factors can be diffed (broadcast→shuffle-join flips, exchange
  * count changes, pushdown loss). Static plans: broadcast decisions come
  * from file-size statistics, which is exactly the input that changes
  * with sf — AQE runtime re-planning is observed via Bench timings, not
  * here.
  *
  * Usage: runMain graft.Plans <sfDir> <outFile>
  */
object Plans {
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
    graft.queries.Registry.benchSet.foreach { d =>
      val plan =
        try d.fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
      sb.append(s"==== ${d.name}\n").append(plan).append("\n")
      spark.catalog.clearCache()
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plans] ${graft.queries.Registry.benchSet.size} plans -> $out")
    spark.stop()
  }
}
