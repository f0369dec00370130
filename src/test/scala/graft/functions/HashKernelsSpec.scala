package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The native kernels must be bit-identical to the builtin-function
  * chains they replaced (same XXH64, same seed composition, same
  * majority-tie semantics) — proven here by evaluating both on the same
  * data, including via codegen (default) and interpreted (eval) paths.
  */
class HashKernelsSpec extends SparkSpec {

  /** The original builtin-chain formulations, kept as the spec oracle. */
  private def minhashesRef(bh: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(bh, h => xxhash64(lit(i), h)))
    }: _*)

  private def simhashRef(hashes: Column): Column = {
    val bits = (0 until 64).map { i =>
      val ones = aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(1L))
      when(ones * 2 >= size(hashes), lit(1L)).otherwise(lit(0L)) * lit(1L << i)
    }
    bits.reduce(_ + _)
  }

  private lazy val docs = {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random token-hash arrays of varied lengths
    (1 to 200).map { i =>
      val n = 1 + (i * 7919) % 40
      (1 to n).map(j => (i * 1000003L + j * 65537L) * 2654435761L).toSeq
    }.toDF("bh")
  }

  test("MinHashes matches the builtin xxhash64 chain bit-for-bit") {
    val rows = docs.select(
      graft.operators.Dedup.minhashes(col("bh"), 16).as("fast"),
      minhashesRef(col("bh"), 16).as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("SimHash64 matches the builtin aggregate fold bit-for-bit") {
    val rows = docs.select(
      graft.operators.Dedup.simhashFromHashes(col("bh")).as("fast"),
      simhashRef(col("bh")).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("edge cases: empty array and null input") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(Seq.empty[Long]), None).toDF("bh")
    val out = df.select(
      graft.operators.Dedup.minhashes(col("bh"), 4).as("mh"),
      graft.operators.Dedup.simhashFromHashes(col("bh")).as("sig")).collect()
    assert(out(0).isNullAt(0))            // empty → null minhash signature
    assert(out(0).getLong(1) == -1L)      // empty → all-ones simhash (0>=0 ties)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
  }

  test("wrong input type fails at analysis time with a readable message") {
    val s = spark
    import s.implicits._
    val strings = Seq(Seq("a", "b")).toDF("t")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      strings.select(graft.operators.Dedup.simhashFromHashes(col("t"))).head
    }
    assert(e.getMessage.toLowerCase.contains("type"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      strings.select(graft.operators.Dedup.minhashes(col("t"), 4)).head
    }
    assert(e2.getMessage.toLowerCase.contains("type"))
  }

  test("portableHash64 equals the md5 digest's lower 64 bits (signed)") {
    val s = spark
    import s.implicits._
    def expected(str: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8"))
      // hex digits 17..32 = digest bytes 8..15, big-endian
      (8 until 16).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
    }
    val inputs = Seq("hello", "", "the", "Ünïcødé ✓", "0", "a" * 100)
    val got = inputs.toDF("t").select(Seeds.portableHash64(col("t")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == inputs.map(expected))
    // native kernel ≡ builtin conv/decimal chain
    val viaBuiltin = inputs.toDF("t").select(Seeds.portableHash64Builtin(col("t")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == viaBuiltin)
    // analysis-time type check
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(Seeds.portableHash64(col("x"))).head
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }

  test("kernels agree between codegen and interpreted eval") {
    val mh = MinHashes(org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("bh")), 8)
    // interpreted path: call nullSafeEval directly on a literal ArrayData
    val arr = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(1L, 2L, 3L))
    val direct = mh.nullSafeEval(arr)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val s = spark
    import s.implicits._
    val viaPlan = Seq(Seq(1L, 2L, 3L)).toDF("bh")
      .select(graft.operators.Dedup.minhashes(col("bh"), 8)).head.getSeq[Long](0)
    assert(direct.toSeq == viaPlan)
  }
}
