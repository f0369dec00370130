package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the degenerate-vector contract of the top-k searches: zero-norm or
  * length-mismatched pairs score NaN/null and are EXCLUDED from the
  * ranking (the bounded-buffer TopK aggregate drops them), unlike a
  * `row_number` window over `cos DESC` which would rank NaN first. The
  * divergence is intentional — see the Similarity scaladocs. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Seq(1.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f)),
    (3L, Seq(0.0f, 0.0f)),      // zero-norm: cos is NaN against anything
    (4L, Seq(1.0f, 0.0f, 0.5f)) // length mismatch vs 2-dim queries: null dot
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK drops NaN/null-scoring pairs instead of ranking them first") {
    val queries = Seq((100L, Seq(1.0f, 0.0f))).toDF("qid", "qvec")
    val out = Similarity.bruteForceTopK(corpus, queries, k = 4)
      .orderBy("rnk").collect()
    // only the two well-formed vectors rank; ids 3 (zero-norm) and 4
    // (length mismatch) are absent, so fewer than k rows come back
    assert(out.map(_.getAs[Long]("neighbor")).toSeq === Seq(1L, 2L))
    assert(out.forall(r => !r.getAs[Double]("cos").isNaN))
  }

  test("a zero-norm query yields zero rows (every pair is NaN)") {
    val queries = Seq((100L, Seq(0.0f, 0.0f))).toDF("qid", "qvec")
    assert(Similarity.bruteForceTopK(corpus, queries, k = 3).isEmpty)
  }

  test("cellTopK obeys the same degenerate-pair exclusion") {
    val cCorpus = corpus.withColumn("cell", lit(0))
    val queries = Seq((100L, Seq(1.0f, 0.0f))).toDF("qid", "qvec")
      .withColumn("qcell", lit(0))
    val out = Similarity.cellTopK(cCorpus, queries, k = 4, cell = "cell", qcell = "qcell")
      .orderBy("rnk").collect()
    assert(out.map(_.getAs[Long]("neighbor")).toSeq === Seq(1L, 2L))
  }

  test("sparseCosinePairs: identical docs hit 1.0, hand-computed pair, disjoint absent") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), // identical → cos 1.0
      (3L, "alpha alpha"), // vs doc1: dot=2, |(2)|=2, |(1,1)|=√2 → 2/(2√2)=1/√2
      (4L, "zeta")) // shares nothing
      .toDF("doc_id", "text")
    val out = Similarity.sparseCosinePairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // identical docs: 2/(√2·√2) — deterministic IEEE, a hair under 1.0
    assert(out((1L, 2L)) === 2.0 / (math.sqrt(2.0) * math.sqrt(2.0)))
    assert(out((1L, 3L)) === 2.0 / (2.0 * math.sqrt(2.0)))
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }
}
