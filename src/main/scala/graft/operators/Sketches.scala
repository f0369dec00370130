package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{MisraGries, Seeds, TopK}

/** Mergeable cardinality / frequency sketches for 100 TB-scale profiling.
  *
  * Exact `COUNT(DISTINCT x)` over a petabyte table is a full shuffle of
  * every distinct value; exact per-key frequencies need a groupBy as wide
  * as the key space. The sketch versions bound both state and exchange:
  *
  *   - KMV (k minimum values) distinct-count sketch: keep the k smallest
  *     DISTINCT hash values per group — O(k) state via the bounded-buffer
  *     [[graft.functions.TopK]] aggregate, so the exchange carries ≤ k
  *     longs per (partition, group) with full map-side partial
  *     aggregation. Estimator: (k−1)/U(k) where U(k) is the k-th order
  *     statistic mapped to [0,1). Sketches MERGE (union, re-take k
  *     smallest) — the rollup property exact distinct counts lack.
  *   - Count-min frequency sketch: a d×w counter grid; every value
  *     increments one counter per row via independent salted hashes, a
  *     point estimate is the min over its d counters (always ≥ truth).
  *     Building is a map-side-combined count onto d·w cells — a 100 TB
  *     scan exchanges kilobytes.
  *
  * Both use the engine-portable md5-lower-64 hash ([[Seeds.portableHash64]])
  * so a DuckDB oracle re-derives identical sketches, and both estimators
  * are pure IEEE `+ / cast` arithmetic — bit-identical across engines with
  * no rounding tolerance needed.
  */
object Sketches {

  private val TWO63 = 9223372036854775808.0 // 2^63 (exact double)
  private val TWO64 = 1.8446744073709551616e19 // 2^64 (exact double)

  /** Signed portable hash of a value (md5 lower 64, two's complement). */
  def valueHash(value: Column): Column = Seeds.portableHash64(value.cast("string"))

  /** KMV sketch column: ascending array of the k smallest distinct signed
    * hashes of `value` (signed order == unsigned-uniform order shifted —
    * the estimator accounts for the shift). Use inside `groupBy(...).agg`. */
  def kmvSketch(value: Column, k: Int): Column = {
    val h = valueHash(value)
    transform(TopK.bottomKDistinct(h, h, k), _.getField("id"))
  }

  /** Production-hash twin of [[kmvSketch]]: xxhash64 instead of the
    * md5-lower-64 oracle hash. The sf10 bench put q118's per-row cost at
    * the md5 kernel, not the k-slot buffer — the sketch scan is
    * hash-bound, and xxhash64 (codegen'd builtin, no digest allocation)
    * is ~an order of magnitude cheaper per row. Same buffer, same
    * estimator ([[kmvEstimate]] — uniform over the signed 64-bit line
    * holds for any good 64-bit hash), same merge law; the only loss is
    * DuckDB re-derivability, which is what [[kmvSketch]] is for. At
    * 100 TB use this form; keep the md5 form for cross-engine audits. */
  def kmvSketchFast(value: Column, k: Int): Column = {
    val h = xxhash64(value.cast("string"))
    transform(TopK.bottomKDistinct(h, h, k), _.getField("id"))
  }

  /** Distinct-count estimate from a KMV sketch: exact size when the set
    * never filled the buffer, else (k−1)/U(k) with
    * U(k) = (h(k) + 2^63) / 2^64 ∈ (0, 1). */
  def kmvEstimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        ((element_at(kmv, k).cast("double") + lit(TWO63)) / lit(TWO64)))

  /** Merge two KMV sketches: k smallest distinct of the union. Pure
    * builtin HOFs — mergeable in SQL, in a reduce, or across files. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** DuckDB mirror of the signed lower-64 md5 hash given a hex column
    * reference (16 digit extractions re-signed through HUGEINT). */
  def signed64FromHexSql(hx: String): String = {
    val terms = (0 until 16).map { i =>
      s"CAST(instr('0123456789abcdef', substring($hx, ${17 + i}, 1)) - 1 AS HUGEINT) * ${BigInt(16).pow(15 - i)}"
    }.mkString(" + ")
    s"CAST(CASE WHEN ($terms) >= 9223372036854775808 THEN ($terms) - 18446744073709551616 ELSE ($terms) END AS BIGINT)"
  }

  /** DuckDB mirror of [[kmvEstimate]] given a sorted distinct-hash list
    * column `hs` and its length `nd`. */
  def kmvEstimateSql(hs: String, nd: String, k: Int): String =
    s"CASE WHEN $nd < $k THEN CAST($nd AS DOUBLE) ELSE ${(k - 1).toDouble} / " +
      s"((CAST($hs[$k] AS DOUBLE) + 9223372036854775808.0) / 18446744073709551616.0) END"

  // ---- count-min ----

  private def cmsCol(value: Column, j: Int, w: Int): Column =
    pmod(valueHash(concat(lit(s"cms$j|"), value.cast("string"))), lit(w.toLong))

  /** Build the d×w counter grid over `value` (optionally weighted):
    * one row per non-empty cell — (row_idx, col_idx, counter). */
  def cmsSketch(df: DataFrame, value: Column, d: Int = 4, w: Int = 256,
                weight: Column = lit(1L)): DataFrame = {
    require(d >= 1 && w >= 2)
    df.select(weight.cast("long").as("__w"),
        posexplode(array((0 until d).map(j => cmsCol(value, j, w)): _*))
          .as(Seq("row_idx", "col_idx")))
      .groupBy("row_idx", "col_idx")
      .agg(sum("__w").as("counter"))
  }

  /** Point-frequency estimates for `probes` (column `probe`): min over the
    * d counters each probe hashes to. The sketch is d·w rows — broadcast;
    * absent cells count 0. Estimates are exact-or-over, never under. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, d: Int = 4, w: Int = 256): DataFrame = {
    val exploded = probes.select(col("probe"),
      posexplode(array((0 until d).map(j => cmsCol(col("probe"), j, w)): _*))
        .as(Seq("row_idx", "col_idx")))
    exploded.join(broadcast(sketch), Seq("row_idx", "col_idx"), "left")
      .groupBy("probe")
      .agg(min(coalesce(col("counter"), lit(0L))).as("est"))
  }

  // ---- bloom ----

  /** 63 usable bits per word: bit positions stay ≤ 62 so `1 << bit` never
    * overflows a signed 64-bit value in ANY engine (DuckDB raises on
    * `1::BIGINT << 63`). */
  private val BloomBitsPerWord = 63L

  private def bloomPos(value: Column, j: Int, mBits: Long): Column =
    pmod(valueHash(concat(lit(s"bloom$j|"), value.cast("string"))), lit(mBits))

  /** Build a Bloom filter over `value`: (word_idx, bits) rows, one per
    * non-empty word — `bit_or` partial-aggregates map-side, so a 100 TB
    * key scan exchanges at most `words` longs per partition. The filter
    * then BROADCASTS to membership tests — the decontamination pattern
    * that replaces joining the corpus against the eval set with a
    * map-side bit probe. */
  def bloomBuild(df: DataFrame, value: Column, words: Int, k: Int): DataFrame = {
    require(words >= 1 && k >= 1)
    val mBits = words * BloomBitsPerWord
    df.select(explode(array((0 until k).map(j => bloomPos(value, j, mBits)): _*)).as("p"))
      .select(expr(s"p div $BloomBitsPerWord").as("word_idx"),
        expr(s"shiftleft(bigint(1), int(p % $BloomBitsPerWord))").as("mask"))
      .groupBy("word_idx")
      .agg(expr("bit_or(mask)").as("bits"))
  }

  /** Membership test: 1 iff ALL k bits are set (may false-positive, never
    * false-negative). `probes` carries a `probe` column. */
  def bloomMightContain(sketch: DataFrame, probes: DataFrame, words: Int, k: Int): DataFrame = {
    val mBits = words * BloomBitsPerWord
    probes
      .select(col("probe"),
        explode(array((0 until k).map(j => bloomPos(col("probe"), j, mBits)): _*)).as("p"))
      .select(col("probe"), expr(s"p div $BloomBitsPerWord").as("word_idx"),
        expr(s"shiftleft(bigint(1), int(p % $BloomBitsPerWord))").as("mask"))
      .join(broadcast(sketch), Seq("word_idx"), "left")
      .groupBy("probe")
      .agg(min(when(coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) === col("mask"), 1)
        .otherwise(0)).cast("int").as("might_contain"))
  }

  // ---- hyperloglog ----

  /** α_m · m² · 2^64 — the raw-HLL estimator numerator as one double
    * literal shared verbatim with the oracle SQL (`Double.toString`
    * round-trips to the identical bit pattern in any IEEE engine). */
  private def hllNumerator(m: Int): Double =
    0.7213 / (1.0 + 1.079 / m) * m.toDouble * m.toDouble * TWO64

  /** Register index: low log₂(m) bits of the portable value hash. */
  def hllBucket(value: Column, m: Int): Column = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    pmod(valueHash(value), lit(m.toLong)).cast("int")
  }

  /** ρ = (trailing zeros of the salted rho-hash) + 1, capped at 64.
    * Generated as a divisibility CASE chain (`h % 2^k = 0`) — no ctz
    * builtin or `h & -h` negation (which overflows at `Long.MinValue`
    * under ANSI/checked engines), so the same chain runs bit-identically
    * on Spark and any SQL oracle. Note `1L << 63 == Long.MinValue`:
    * `h % Long.MinValue == 0` still tests divisibility by 2^63. */
  def hllRho(value: Column): Column = {
    val h = valueHash(concat(lit("hll|"), value.cast("string")))
    (63 to 1 by -1).foldLeft(when(h === 0, lit(64))) { (acc, k) =>
      acc.when(h % lit(1L << k) === 0, lit(k + 1))
    }.otherwise(lit(1))
  }

  /** HLL sketch of `value` per group: one (groupCols…, bucket, register)
    * row per non-empty register, register = MAX(ρ). The groupBy partial-
    * aggregates map-side, so a 100 TB scan exchanges ≤ |groups|·m small
    * ints per partition — the fixed-size-state cardinality sketch (KMV's
    * k·8-byte state beats it on accuracy-per-byte only below ~k distinct;
    * HLL's register grid wins at billions). Sketches merge by
    * `union → groupBy(bucket).max(register)` ([[hllMerge]]) — the rollup
    * property that lets per-file sketches fold into a corpus sketch
    * without rescanning. */
  def hllSketch(df: DataFrame, value: Column, groupCols: Seq[String], m: Int = 256): DataFrame =
    df.filter(value.isNotNull) // NULL is no element (COUNT DISTINCT semantics),
      // not a register — an unfiltered null would seed a null bucket row
      // that poisons the estimator's decimal sum
      .select(groupCols.map(col) :+ hllBucket(value, m).as("bucket")
        :+ hllRho(value).as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("register"))

  /** Merge sketches built by [[hllSketch]] over the same m. */
  def hllMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.union(b).groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("register").as("register"))

  /** 2^(64−register) as an exact decimal — the scaled-integer form of the
    * estimator term 2^−register. Summing these exactly (decimal, never
    * double) makes the final estimate one IEEE division of two
    * deterministic operands: bit-identical across engines and partition
    * orders, no rounding tolerance needed. */
  private def hllTerm(register: Column): Column =
    (1 to 64).foldLeft(lit(null).cast("decimal(38,0)")) { (acc, r) =>
      when(register === r, lit(BigDecimal(BigInt(2).pow(64 - r))).cast("decimal(38,0)"))
        .otherwise(acc)
    }

  /** Raw-HLL distinct estimate per group from a register table: absent
    * registers contribute 2^64 (ρ=0) to the exact decimal denominator.
    * No small-range linear-counting branch — it needs `ln` (libm, not
    * bit-portable) and the raw estimator is already deterministic; callers
    * wanting the correction can apply it to this output. */
  def hllEstimate(sketch: DataFrame, groupCols: Seq[String], m: Int = 256): DataFrame = {
    val two64 = lit(BigDecimal(BigInt(2).pow(64))).cast("decimal(38,0)")
    sketch.groupBy(groupCols.map(col): _*)
      .agg((sum(hllTerm(col("register"))) +
        (lit(m) - count(lit(1))).cast("decimal(38,0)") * two64).as("__S"))
      .select(groupCols.map(col) :+
        (lit(hllNumerator(m)) / col("__S").cast("double")).as("est_distinct"): _*)
  }

  /** DuckDB mirror of [[hllRho]] given a signed-64 hash expression. */
  def hllRhoSql(h: String): String = {
    val branches = (63 to 1 by -1).map { k =>
      s"WHEN ($h) % CAST(${BigInt(2).pow(k)} AS HUGEINT) = 0 THEN ${k + 1}"
    }.mkString(" ")
    s"CASE WHEN ($h) = 0 THEN 64 $branches ELSE 1 END"
  }

  /** DuckDB mirror of [[hllTerm]] given a register column reference. */
  def hllTermSql(reg: String): String = {
    val branches = (1 to 64).map { r =>
      s"WHEN $r THEN CAST(${BigInt(2).pow(64 - r)} AS DECIMAL(38,0))"
    }.mkString(" ")
    s"CASE $reg $branches END"
  }

  /** DuckDB mirror of [[hllEstimate]]'s final expression given the
    * exact-decimal denominator column reference. */
  def hllEstimateSql(s: String, m: Int): String =
    s"${hllNumerator(m)} / CAST($s AS DOUBLE)"

  // --- exact heavy hitters (two-pass Misra–Gries) ---

  /** EXACT heavy hitters over a corpus-sized key domain in two bounded
    * passes: every `value` with frequency STRICTLY ABOVE n/(k+1) (n =
    * non-null items), with its exact count.
    *
    * Pass 1 reduces the stream to ONE ≤ k-entry Misra–Gries summary
    * ([[graft.functions.MisraGries]]): map-side partial aggregation keeps
    * k counters per task, the exchange carries at most k counters per
    * task — sketch-width. The MG guarantee (undercount ≤ n/(k+1) under
    * any merge tree) makes the candidate set a SUPERSET of the true heavy
    * hitters, so pass 2 — an exact recount of candidates only — yields a
    * result that is deterministic and partitioning-independent even
    * though the sketch's marginal entries are not: the threshold filter
    * discards exactly the noise.
    *
    * Pass 2's plan: the ≤ k candidates (with n riding along) BROADCAST
    * into the item scan, the join filters map-side, and the recount
    * groupBy partial-aggregates ≤ k+1 keys per task. Neither pass ever
    * shuffles vocabulary-width — the contrast is `groupBy(value).count()
    * .filter(...)`, whose exchange carries one row per DISTINCT key (for
    * n-gram or URL domains, the corpus itself).
    *
    * Cost of exactness: two scans of `items`. The single-scan alternative
    * returns sketch ESTIMATES whose sub-threshold tail depends on
    * partitioning — unusable as a deterministic operator contract.
    *
    * @param items one row per item (pre-explode tokens upstream)
    * @param value string-typed item expression; nulls are not items
    * @param k     sketch width; output threshold is n/(k+1)
    * @return (token string, cnt long) — exact counts, cnt·(k+1) > n
    */
  def heavyHitters(items: DataFrame, value: Column, k: Int): DataFrame = {
    val sk = items.agg(
      count(value).as("__n"),
      MisraGries.sketch(value, k).as("__mg"))
    val cands = sk.select(col("__n"), explode(col("__mg")).as("__e"))
      .select(col("__n"), col("__e.token").as("token"))
    items.select(value.cast("string").as("token"))
      .join(broadcast(cands), "token")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"), first(col("__n")).as("__n"))
      .filter(col("cnt") * (k + 1) > col("__n"))
      .drop("__n")
  }
}
