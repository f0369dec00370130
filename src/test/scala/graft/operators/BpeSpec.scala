package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training against the textbook corpus (Sennrich et al. 2016, §3.2
  * uses {low, lower, newest, widest}): expected merges are hand-derived
  * from the frequency table, so the trainer's pair counting, tie-break,
  * and greedy fuse are all pinned exactly. */
class BpeSpec extends SparkSpec {

  // low×5, lower×2, newest×6, widest×3 — the classic distribution
  private lazy val corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest")).toDF("doc_id", "text")
  }

  test("train reproduces the textbook merge sequence with deterministic tie-breaks") {
    val m = Bpe.train(corpus, nMerges = 4)
    // pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (w,e)=8(lower2+newest6)...
    // ties at 9 break lexicographically: (e,s) < (s,t) < (t,</w>)
    assert(m(0).left == "e" && m(0).right == "s" && m(0).count == 9)
    // round 2: es+t = 9 again; lexicographic winner among 9-count pairs
    assert(m(1).left == "es" && m(1).right == "t" && m(1).count == 9)
    assert(m(2).left == "est" && m(2).right == "</w>" && m(2).count == 9)
    // round 4: l+o appears in low(5) + lower(2) = 7
    assert(m(3).left == "l" && m(3).right == "o" && m(3).count == 7)
  }

  test("train stops when no pair repeats; merges never exceed request") {
    val s = spark
    import s.implicits._
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // every adjacent pair occurs once — nothing to merge
    assert(Bpe.train(tiny, nMerges = 10).isEmpty)
    assert(Bpe.train(corpus, nMerges = 2).length == 2)
  }

  test("encodeBatch: tokens concatenate back to the words; more merges → fewer tokens") {
    val m10 = Bpe.train(corpus, nMerges = 10)
    val enc = Bpe.encodeBatch(corpus, m10).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getInt(2)))).toMap
    corpus.collect().foreach { r =>
      val (toks, n) = enc(r.getLong(0))
      assert(toks.length == n)
      // lossless: stripping the word markers reproduces the text
      val rebuilt = toks.mkString("").replace(Bpe.EndOfWord, " ").trim
      assert(rebuilt == r.getString(1).split("\\s+").mkString(" "))
    }
    val enc0 = Bpe.encodeBatch(corpus, Nil).collect().map(r => r.getInt(2)).sum
    val enc10 = enc.values.map(_._2).sum
    assert(enc10 < enc0, s"merges should compress: $enc10 !< $enc0")
    // after enough merges the frequent word "newest</w>" is one token
    val doc3 = enc(3L)._1
    assert(doc3.forall(_ == doc3.head), s"newest should fuse fully: $doc3")
  }

  test("losslessness holds for random corpora at any merge count") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xB9E)
    val alphabet = "abcd"
    def word() = (0 until (1 + rnd.nextInt(6)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (trial <- 0 until 3) {
      val docs = (1L to 8L).map(id =>
        (id, (0 until (1 + rnd.nextInt(10))).map(_ => word()).mkString(" ")))
        .toDF("doc_id", "text")
      val merges = Bpe.train(docs, nMerges = 3 + rnd.nextInt(12))
      val enc = Bpe.encodeBatch(docs, merges).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      docs.collect().foreach { r =>
        val rebuilt = enc(r.getLong(0)).mkString("")
          .replace(Bpe.EndOfWord, " ").trim
        assert(rebuilt == r.getString(1).split("\\s+").mkString(" "),
          s"trial $trial doc ${r.getLong(0)}")
      }
    }
  }

  test("training is partitioning-stable (driver-scalar argmax with lexicographic ties)") {
    val a = Bpe.train(corpus, nMerges = 5)
    val b = Bpe.train(corpus.repartition(7), nMerges = 5)
    assert(a.map(m => (m.rank, m.left, m.right, m.count)) ===
      b.map(m => (m.rank, m.left, m.right, m.count)))
  }
}
