package graft.queries

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Quantize
import org.apache.spark.sql.functions._

/** Guards the q88 encode/table coherence invariant (ADVICE r9): the
  * bounded TopK aggregate SKIPS null keys where the replaced row_number
  * window would have ranked them first, so a code id missing from the
  * broadcast ADC lookup tables (element_at → null) would silently drop
  * neighbors instead of surfacing. Every pqEncode code id must therefore
  * be present in every query's adcTables — and no ADC distance may be
  * null. */
class Q88AdcGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every pqEncode code id is a key of every subspace's ADC table") {
    val emb = Tables.load(spark, dir, "embeddings")
    val books = Quantize.sliceCodebooks(
      Quantize.trainCentroids(emb, "label", "embedding"), m = 4)
    val codes = emb.select(posexplode(
      Quantize.pqEncode(col("embedding"), books)).as(Seq("ss", "code")))
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val q = emb.filter(col("vec_id") < 10).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toIndexedSeq
    val luts = Quantize.adcTables(q, books)
    val missing = codes.filterNot { case (ss, code) => luts(ss).contains(code) }
    assert(missing.isEmpty,
      s"code ids absent from the ADC tables (would null out silently): $missing")
  }

  test("q88's ADC distance column is never null over the fixture corpus") {
    val emb = Tables.load(spark, dir, "embeddings")
    val books = Quantize.sliceCodebooks(
      Quantize.trainCentroids(emb, "label", "embedding"), m = 4)
    val codes = emb.select(col("vec_id").as("neighbor"),
      Quantize.pqEncode(col("embedding"), books).as("codes"))
    val queries = emb.filter(col("vec_id") < 10).select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0),
        Quantize.adcTables(r.getSeq[Float](1).map(_.toDouble).toIndexedSeq, books)))
      .toSeq
    val sess = spark
    import sess.implicits._
    val qdf = queries.toDF("qid", "luts")
    val nNull = codes.join(broadcast(qdf), col("neighbor") =!= col("qid"))
      .withColumn("d", Quantize.adcScore(col("codes"), col("luts"), m = 4))
      .filter(col("d").isNull).count()
    assert(nNull == 0L,
      s"$nNull null ADC distances — an encode/table mismatch would drop neighbors silently under TopK")
  }
}
