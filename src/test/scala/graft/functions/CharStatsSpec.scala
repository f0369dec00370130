package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CharStatsSpec extends SparkSpec {

  private def one(text: String): (Double, Double) = {
    val s = spark
    import s.implicits._
    val r = Seq(text).toDF("t")
      .select(Text.charEntropy(col("t")).as("e"),
        Text.digitFraction(col("t")).as("d"))
      .collect()(0)
    (r.getDouble(0), r.getDouble(1))
  }

  test("charEntropy: uniform two-symbol stream is ln 2; single symbol is 0") {
    val (e2, _) = one("abab")
    assert(math.abs(e2 - math.log(2)) < 1e-8, s"got $e2")
    val (e1, _) = one("aaaa")
    assert(e1 === 0.0)
    // case-insensitive, non-alnum ignored
    val (eMixed, _) = one("A b! A b?")
    assert(math.abs(eMixed - math.log(2)) < 1e-8)
  }

  test("charEntropy matches the direct Shannon formula on a skewed stream") {
    // "aab": p(a)=2/3, p(b)=1/3 — each term rounds to the 1e-9 grid first
    def round9(x: Double) = math.rint(x * 1e9) / 1e9
    val want = round9(-(2.0 / 3) * math.log(2.0 / 3)) + round9(-(1.0 / 3) * math.log(1.0 / 3))
    val (e, _) = one("aab")
    assert(math.abs(e - want) < 1e-12, s"got $e want $want")
  }

  test("digitFraction counts digits in the alnum stream; empty text is 0") {
    assert(one("a1b2")._2 === 0.5)
    assert(one("only letters here")._2 === 0.0)
    assert(one("...")._2 === 0.0 && one("...")._1 === 0.0)
    assert(one("")._1 === 0.0)
  }

  test("kernel equals the independent HOF formulation on the corpus") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(Text.charEntropy(col("text")).as("k"),
        Text.charEntropyHof(col("text")).as("h"))
    assert(df.filter(col("k") =!= col("h")).count() === 0L)
  }

  test("natural text scores higher entropy than repeated-char junk") {
    val (nat, _) = one("the quick brown fox jumps over the lazy dog")
    val (junk, _) = one("zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")
    assert(nat > 2.0 && junk === 0.0)
  }
}
