package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextKernelsSpec extends SparkSpec {

  test("TokenCount ≡ size(regexp_extract_all(lower(text), '[a-z0-9]+'))") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      "hello world", "  a  b  c ", "", "   ", "UPPER lower MiXeD",
      "num8er5 42", "-punct,only.!", "a", "trailing space ", " leading",
      "tab\tand\nnewline", "unicode: héllo wörld θ δ", "日本語テキスト abc",
      "Kelvin K sign", // U+212A lowercases to 'k' — a real token
      "dotted İ capital I", // U+0130 lowers to i + combining dot
      "a1b2c3", "___under__score___", "ütf8 ümläuts", "mixed日本abc語def")
    val df = cases.toDF("t")
    val out = df.select(
      TextKernels.tokenCountCol(col("t")).as("native"),
      size(regexp_extract_all(lower(col("t")), lit("[a-z0-9]+"), lit(0)))
        .as("builtin"),
      col("t"))
      .collect()
    out.foreach { r =>
      assert(r.getInt(0) === r.getInt(1), s"mismatch on '${r.getString(2)}'")
    }
  }

  test("TokenCount agrees with the regex chain on random ASCII+unicode fuzz") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val alphabet = "abcXYZ019 .,-\t\né語θ"
    val cases = Seq.fill(300)(
      (1 to rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val bad = cases.toDF("t").select(
      TextKernels.tokenCountCol(col("t")).as("a"),
      size(regexp_extract_all(lower(col("t")), lit("[a-z0-9]+"), lit(0))).as("b"),
      col("t"))
      .filter(col("a") =!= col("b")).collect()
    assert(bad.isEmpty, bad.map(_.getString(2)).mkString("; "))
  }

  test("TokenCount stays inside whole-stage codegen") {
    val s = spark
    val df = s.range(10).select(concat(lit("word "), col("id")).as("t"))
      .select(TextKernels.tokenCountCol(col("t")).as("n"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"kernel fell out of codegen:\n$p")
  }
}
