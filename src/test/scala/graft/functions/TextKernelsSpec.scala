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

  test("nfc composes decomposed sequences and round-trips composed input") {
    import org.apache.spark.unsafe.types.UTF8String
    val decomposed = UTF8String.fromString("cafe\u0301") // e + combining acute
    assert(TextKernels.nfc(decomposed).toString === "caf\u00e9")
    // already-NFC non-ASCII input comes back value-equal
    val composed = UTF8String.fromString("caf\u00e9 \u8a9e")
    assert(TextKernels.nfc(composed) === composed)
  }

  test("nfc ASCII fast path returns the input object without allocation") {
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("plain ascii text 123")
    assert(TextKernels.nfc(ascii) eq ascii) // reference equality: no copy
  }

  test("nfcCol matches java.text.Normalizer on mixed fuzz and keeps codegen") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "a\u00e9\u00f6 xyze\u0301n\u0303\u8a9e"
    val cases = Seq.fill(200)(
      (0 to rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    // repartition: keeps Catalyst from constant-folding the local relation
    // so the codegen assertion below sees a real projection
    val df = cases.toDF("t").repartition(2)
      .select(col("t"), TextKernels.nfcCol(col("t")).as("n"))
    df.collect().foreach { r =>
      val expect = java.text.Normalizer.normalize(r.getString(0), java.text.Normalizer.Form.NFC)
      assert(r.getString(1) === expect)
    }
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"kernel fell out of codegen:\n$p")
  }

  test("editWithin ≡ levenshtein(a,b) <= k on random fuzz, all k") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val alphabet = "abcde 語é"
    def word() = (0 to rnd.nextInt(14)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val pairs = Seq.fill(400)((word(), word()))
    for (k <- Seq(0, 1, 2, 5)) {
      val bad = pairs.toDF("a", "b")
        .select(col("a"), col("b"),
          TextKernels.editWithinCol(col("a"), col("b"), k).as("band"),
          (levenshtein(col("a"), col("b")) <= k).as("full"))
        .filter(col("band") =!= col("full")).collect()
      assert(bad.isEmpty, s"k=$k: " +
        bad.take(3).map(r => s"'${r.getString(0)}' vs '${r.getString(1)}'").mkString("; "))
    }
  }

  test("graft_edit_within early-exits: huge strings with distant prefixes stay fast") {
    import org.apache.spark.unsafe.types.UTF8String
    val a = UTF8String.fromString("x" * 100000)
    val b = UTF8String.fromString("y" * 100000)
    val t0 = System.nanoTime()
    assert(!TextKernels.editWithin(a, b, 3))
    // full DP would be 10^10 cells; the band exits after ~4 rows
    assert((System.nanoTime() - t0) / 1e6 < 200, "band did not early-exit")
  }

  test("graft_nfc is reachable from SQL") {
    val s = spark
    graft.plans.GraftExtensions.register(s)
    val out = s.sql("SELECT graft_nfc(concat('cafe', '\u0301')) AS n")
      .collect().head.getString(0)
    assert(out === "caf\u00e9")
  }
}
