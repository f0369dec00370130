package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, bit by bit. */
  private def morton(x: Long, y: Long): Long =
    (0 until 16).map { b =>
      (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }.sum

  test("zValue16 equals the bitwise-reference Morton code") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (255L, 256L))
    val out = pts.toDF("x", "y")
      .select(Layout.zValue16(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(out === pts.map { case (x, y) => morton(x, y) })
  }

  test("z-ordered buckets bound both dimensions (the data-skipping property)") {
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val buckets = grid
      .withColumn("z", Layout.zValue16(col("x"), col("y")))
      .groupBy((col("z") / 256).cast("long").as("b")) // 256 z-values = one 16x16 tile
      .agg(max("x") - min("x") as "xr", max("y") - min("y") as "yr")
      .collect()
    // each 256-wide z-range is a 16x16 tile: both spans are 15
    buckets.foreach { r =>
      assert(r.getLong(1) <= 15 && r.getLong(2) <= 15)
    }
  }

  test("zorderRepartition keeps rows and tightens per-partition bounds") {
    val rng = new scala.util.Random(7)
    val pts = Seq.fill(4000)((rng.nextInt(1024).toLong, rng.nextInt(1024).toLong))
      .toDF("x", "y")
    val parts = 8
    val laid = Layout.zorderRepartition(pts, col("x"), col("y"), parts)
    assert(laid.count() === 4000)
    val bounds = laid
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
      .agg(avg(col("xr") + col("yr"))).as[Double].head()
    val linear = pts.repartitionByRange(parts, col("x"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
      .agg(avg(col("xr") + col("yr"))).as[Double].head()
    // z-order bounds BOTH dims; x-range partitioning leaves y unbounded
    assert(bounds < linear)
  }
}
