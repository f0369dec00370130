package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SinkSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 100L)
    .map(i => (i, s"doc $i body", s"src${i % 4}"))
    .toDF("doc_id", "text", "source")

  test("partitioned parquet: hive layout, partition-pruned read") {
    val dir = Files.createTempDirectory("graft_sink").toString + "/docs"
    Sink.partitionedParquet(docs, dir, Seq("source"), sortWithin = Seq("doc_id"))
    // hive directory layout
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("source=src0", "source=src1", "source=src2", "source=src3"))

    val back = spark.read.parquet(dir).filter($"source" === "src1")
    assert(back.count() === 25)
    // the filter must prune partitions at plan time, not post-filter rows
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("src1"),
      s"expected partition pruning in:\n$p")
    assert(!p.toLowerCase.contains("filter source"), s"unexpected row filter:\n$p")
  }

  test("schema evolution: mergeSchema unions old and new file schemas") {
    val root = Files.createTempDirectory("graft_evo").toString
    val v1 = Seq((1L, "a")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b", "en")).toDF("doc_id", "text", "lang") // column added later
    v1.write.parquet(s"$root/batch=1")
    v2.write.parquet(s"$root/batch=2")
    val back = spark.read.option("mergeSchema", "true").parquet(root)
    assert(back.columns.toSet === Set("doc_id", "text", "lang", "batch"))
    val rows = back.select("doc_id", "lang").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    // pre-evolution rows null-fill the new column instead of failing the read
    assert(rows === Seq((1L, None), (2L, Some("en"))))
  }

  test("csv and orc round trips preserve values; orc pushes filters") {
    val root = Files.createTempDirectory("graft_fmt").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))

    Sink.writeCsv(docs, s"$root/csv")
    val csvBack = Sink.readCsv(spark, s"$root/csv", schema)
    assert(csvBack.orderBy("doc_id").collect().map(_.toSeq).toSeq ===
      docs.orderBy("doc_id").collect().map(_.toSeq).toSeq)

    Sink.writeOrc(docs, s"$root/orc")
    val orcBack = Sink.readOrc(spark, s"$root/orc").filter($"doc_id" === 7L)
    assert(orcBack.count() === 1)
    val p = orcBack.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("doc_id"),
      s"orc scan should push the id predicate:\n$p")
  }

  test("jsonl round trip with explicit schema preserves values") {
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/docs"
    Sink.writeJsonl(docs, dir, partitionCols = Seq("source"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    val back = Sink.readJsonl(spark, dir, schema)
      .select("doc_id", "text", "source")
    val a = back.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = docs.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
