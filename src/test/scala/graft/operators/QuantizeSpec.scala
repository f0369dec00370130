package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {

  private lazy val vecs = {
    val s = spark
    import s.implicits._
    // two clean 4-d clusters around (0,0,10,10) and (8,8,0,0)
    Seq(
      (1L, 0, Seq(0f, 0f, 10f, 10f)),
      (2L, 0, Seq(0f, 2f, 10f, 8f)),
      (3L, 1, Seq(8f, 8f, 0f, 0f)),
      (4L, 1, Seq(8f, 6f, 0f, 2f)))
      .toDF("vec_id", "label", "embedding")
  }

  test("trainCentroids: grid-exact per-cell means") {
    val c = Quantize.trainCentroids(vecs, "label", "embedding")
    assert(c(0) == IndexedSeq(0.0, 1.0, 10.0, 9.0))
    assert(c(1) == IndexedSeq(8.0, 7.0, 0.0, 1.0))
  }

  test("assignNearest picks the closer centroid; exact ties go to the lowest id") {
    val cents = Map(0 -> IndexedSeq(0.0, 0.0), 1 -> IndexedSeq(4.0, 0.0), 2 -> IndexedSeq(2.0, 5.0))
    val s = spark
    import s.implicits._
    val out = Seq(
      (1L, Seq(0.5f, 0f)), // nearest 0
      (2L, Seq(3.9f, 0f)), // nearest 1
      (3L, Seq(2f, 0f)))   // exactly between 0 and 1 → tie → 0
      .toDF("id", "v")
      .select(col("id"), Quantize.assignNearest(col("v"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("lloydStep at a fixed point returns the same centroids with member counts") {
    val cents = Quantize.trainCentroids(vecs, "label", "embedding")
    val out = Quantize.lloydStep(vecs, cents, "embedding")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(out.size == 8) // 2 clusters × 4 dims
    (1 to 4).foreach { p =>
      assert(out((0, p)) == ((cents(0)(p - 1), 2L)))
      assert(out((1, p)) == ((cents(1)(p - 1), 2L)))
    }
  }

  test("pqEncode codes each subspace slice independently") {
    val cents = Quantize.trainCentroids(vecs, "label", "embedding")
    val books = Quantize.sliceCodebooks(cents, m = 2)
    assert(books(0)(0) == IndexedSeq(0.0, 1.0) && books(1)(1) == IndexedSeq(0.0, 1.0))
    val s = spark
    import s.implicits._
    // first half near cluster 1's slice, second half near cluster 0's
    val codes = Seq((1L, Seq(8f, 7f, 10f, 9f))).toDF("id", "v")
      .select(Quantize.pqEncode(col("v"), books).as("codes"))
      .head.getSeq[Int](0)
    assert(codes == Seq(1, 0))
    intercept[IllegalArgumentException](Quantize.sliceCodebooks(cents, m = 3))
  }

  test("kmeans recovers the blob means from a bad initialization") {
    val s = spark
    import s.implicits._
    // blobs around (0,0) and (10,10); both init centroids inside blob A
    val pts = Seq(
      (1L, Seq(0f, 1f)), (2L, Seq(1f, 0f)), (3L, Seq(0f, 0f)),
      (4L, Seq(10f, 11f)), (5L, Seq(11f, 10f)), (6L, Seq(10f, 10f)))
      .toDF("vec_id", "v")
    val init = Map(0 -> IndexedSeq(0.4, 0.4), 1 -> IndexedSeq(2.0, 2.0))
    val (cents, iters, converged) = Quantize.kmeans(pts, init, "v", maxIters = 10)
    assert(converged && iters <= 5, s"did not converge quickly: $iters")
    val sorted = cents.values.toSeq.sortBy(_.head)
    assert(sorted == Seq(
      IndexedSeq(1.0 / 3, 1.0 / 3),
      IndexedSeq(31.0 / 3, 31.0 / 3)))
  }

  test("adcScore reproduces the table-free reconstruction distance") {
    val cents = Quantize.trainCentroids(vecs, "label", "embedding")
    val books = Quantize.sliceCodebooks(cents, m = 2)
    val q = IndexedSeq(1.0, 1.0, 9.0, 9.0)
    val luts = Quantize.adcTables(q, books)
    // manual: subspace 0 vs codeword 0 = (1-0)²+(1-1)² = 1, vs 1 = 49+36=85
    assert(luts(0)(0) == 1.0 && luts(0)(1) == 85.0)
    // codeword 0 slice 2 is (10,9): (9-10)²+(9-9)² = 1; codeword 1 = 81+64=145
    assert(luts(1)(0) == 1.0 && luts(1)(1) == 145.0)
    val s = spark
    import s.implicits._
    val scored = Seq((1L, Seq(0, 0)), (2L, Seq(1, 1)), (3L, Seq(1, 0)))
      .toDF("id", "codes")
      .crossJoin(Seq(Tuple1(luts)).toDF("luts"))
      .select(col("id"), Quantize.adcScore(col("codes"), col("luts"), m = 2).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored == Map(1L -> 2.0, 2L -> 230.0, 3L -> 86.0))
  }
}
