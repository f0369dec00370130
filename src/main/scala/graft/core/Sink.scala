package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Output sinks beyond the plain parquet writer: hive-partitioned layouts
  * (the 100 TB organization that makes downstream reads prune) and
  * newline-delimited JSON for interchange with LLM data tooling.
  *
  * Partition columns become directory levels (`source=web/...`), so any
  * downstream filter on them prunes whole directories at planning time —
  * a scan of one source out of fifty reads 2% of the files, asserted in
  * `SinkSpec`. `sortWithin` additionally orders rows inside each file,
  * which is what makes min/max row-group statistics selective for
  * predicate pushdown on the sorted column.
  */
object Sink {

  /** Hive-partitioned parquet write, optionally sorted within partitions.
    * Caller controls file count per partition upstream via repartition on
    * the partition columns (small-file control at scale). */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                         sortWithin: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortWithin.isEmpty) df
      else df.sortWithinPartitions((partitionCols ++ sortWithin).map(df(_)): _*)
    sorted.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Newline-delimited JSON (jsonl) export — the lingua franca of
    * training-data pipelines. Same partitioned layout rules as parquet. */
  def writeJsonl(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).json(path)
  }

  /** jsonl read with an explicit schema — never schema-infer in production
    * (inference is a full extra pass over 100 TB and can widen types
    * differently per run). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV read with an explicit schema (same no-inference rule; header
    * names are trusted only for ORDER, the schema dictates types). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  /** ORC round trip — the other columnar format Spark writes natively;
    * same pruning/pushdown machinery as parquet. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
