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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(sfDir, name))
    if (name == "events") normalizeTs(df) else df
  }

  /** The driver's `events.ts` has shipped under two physical layouts:
    * TIMESTAMP(NANOS) — which Spark reads as LONG nanos under the
    * nanosAsLong=true session flag set in Verify/Bench — and
    * TIMESTAMP(MICROS), which reads as timestamp_ntz. Every downstream
    * query does integer micros arithmetic via `ts div 1000` to match
    * DuckDB's `epoch_us(ts)` (DuckDB yields epoch micros for either
    * layout), so normalize here to long NANOS: identity for the nanos
    * layout, and an exact ×1000 widening for micros (epoch micros ~2e15
    * × 1000 is far below Long.MaxValue; sessions run timeZone=UTC so the
    * ntz→timestamp cast is the identity wall-clock mapping). One change
    * point instead of 40+ per-query ones, robust to the driver shipping
    * either layout again. */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }

  /** events with `ts_us` (timestamp, micros) added — truncated exactly like
    * DuckDB truncates on read, so time-derived outputs hash-match. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(spark, sfDir, "events")
      .withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
  }

  /** Register all tables as temp views for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
