package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver testdata (TESTDATA.md).
  *
  * Mirrors the reference's dataset registry / LFN resolution
  * (reference: columnflow/tasks/external.py:31-396) reduced to its essence: a
  * name -> file mapping with column-pruned scans. Spark's parquet source
  * handles multi-file datasets, predicate pushdown and nested-schema pruning
  * natively, so no chunked-IO machinery is needed
  * (reference: columnflow/columnar_util.py:3423-4097 ChunkedIOHandler).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))

  /** events with its TIMESTAMP(NANOS) column usable: requires the session
    * flag spark.sql.legacy.parquet.nanosAsLong=true (set in Verify/Bench);
    * adds `ts_us` (timestamp, micros) truncated exactly like DuckDB
    * truncates ns→us on read, so time-derived outputs hash-match. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(spark, sfDir, "events")
      .withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
  }

  /** Register all tables as temp views for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
