package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Rand, Text}

/** Feature extraction for model training over text: the hashing trick
  * (feature index = portable hash of the token, modulo the feature-space
  * size) in sparse (id, dim, tf) form — the input shape `ml/Trainer`'s
  * normal-equations fit and any SGD consumer take.
  *
  * The dimension hash is the engine-portable md5-derived 16-bit value
  * (same primitive as `Rand.portableUniform`), so feature vectors are
  * reproducible across engines and across runs — no vocabulary to fit,
  * no drift between training and serving, the whole point of hashed
  * features at corpus scale. Map-side explode + one (id, dim) count
  * aggregation; document text never shuffles.
  */
object Features {

  /** 16-bit portable token hash (first 4 md5 hex digits). */
  private def tokenHash16(tok: Column): Column = Rand.portableHexNum(0, tok)

  /** Sparse hashed term-frequency features: (idCol, dim, tf) with
    * `dim = md5_16(token) mod dims`. */
  def hashedFeatures(docs: DataFrame, dims: Int,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dims >= 2 && dims <= 65536, "dims must be in [2, 65536]")
    docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("__t"))
      .groupBy(col(idCol), pmod(tokenHash16(col("__t")), lit(dims)).cast("int").as("dim"))
      .agg(count(lit(1)).as("tf"))
  }

  /** DuckDB mirror of the dim assignment for oracle queries. */
  def dimSql(tokExpr: String, dims: Int): String = {
    val digits = (0 until 4).map { i =>
      s"(instr('0123456789abcdef', substring(md5($tokExpr), ${i + 1}, 1)) - 1) * ${1 << (4 * (3 - i))}"
    }.mkString(" + ")
    s"CAST(($digits) % $dims AS INT)"
  }

  /** Leave-one-out target encoding: each row's category encodes as the
    * mean target of the OTHER rows in its category, (Σ−y)/(n−1) — the
    * leakage-safe form of mean encoding (plain mean encoding lets each
    * row see its own label; LOO is the standard fix). Rows in singleton
    * categories encode null (no "others" to average).
    *
    * One aggregate + one join-back. The join side is left to Catalyst:
    * below autoBroadcastJoinThreshold the category table broadcasts (the
    * usual case); a high-cardinality category degrades to a shuffle join
    * instead of blowing the broadcast limit. Exactness: the target
    * canonicalizes to
    * DECIMAL(18,4); Σ−y is exact decimal subtraction and the single
    * /(n−1) division is IEEE — bit-portable as long as the per-category
    * unscaled sum stays under 2^53 (10¹¹ at scale 4 — beyond that,
    * encode per shard and merge). */
  def targetEncodeLoo(df: DataFrame, catCol: String, target: Column): DataFrame = {
    val y = target.cast("decimal(18,4)")
    // count(y), not count(*): a null-target row contributes to neither Σ
    // nor n, so it can't deflate the other rows' means; its own encoding
    // is null (Σ−null)
    val g = df.groupBy(col(catCol))
      .agg(sum(y).as("__s"), count(y).as("__n"))
    df.join(g, Seq(catCol))
      .withColumn("loo_encoding",
        when(col("__n") > 1,
          (col("__s") - y).cast("double") / (col("__n") - 1).cast("double")))
      .drop("__s", "__n")
  }

  /** Quantile (percent-rank) transform at scale: maps each row's value
    * to its within-group rank fraction (rank−1)/(n−1) — exactly
    * `PERCENT_RANK() OVER (PARTITION BY group ORDER BY value)`, with ties
    * sharing the minimum rank — WITHOUT a per-group global sort.
    *
    * Why the window form fails at 100 TB: a handful of coarse groups
    * means PARTITION BY ships ~corpus/|groups| rows through ONE task per
    * group. This form never sorts row-level data:
    *
    *  1. reduce to the distinct (group, value) histogram — a partial
    *     hash aggregate, the only corpus-sized pass;
    *  2. range-bucket the histogram on (group, value)
    *     (`repartitionByRange`, the skyline pattern — equal keys land in
    *     one bucket) and compute the in-bucket strictly-before cumulative
    *     count with a per-(bucket, group) window — each bucket sorts only
    *     its slice of the histogram, all buckets in parallel;
    *  3. fold in a broadcast prefix table of per-(bucket, group) totals
    *     (|buckets|·|groups affected| rows, window over buckets only);
    *  4. join ranks back on (group, value) — broadcast below the
    *     threshold, shuffle otherwise, Catalyst's call.
    *
    * Exactness: the rank fraction is ONE double division of exact longs,
    * the identical operands PERCENT_RANK divides — bit-equal results
    * (q162's oracle hash-matches through this path). Groups with a
    * single row map to 0.0 (PERCENT_RANK's convention). Rows with a null
    * group or value are DROPPED (the rank join-back is null-rejecting) —
    * unlike the window form, which ranks nulls first; filter or coalesce
    * nulls upstream if they must rank. The rank fraction lands in
    * `outCol` (must not collide with an existing column). The two
    * join-backs carry NO broadcast hint: the prefix table is
    * |buckets|·|groups| rows and the totals table |groups| rows, so with
    * a high-cardinality group column a forced broadcast would OOM the
    * driver — Catalyst/AQE picks broadcast when the post-aggregate stats
    * are small and degrades to a shuffle join otherwise. */
  def quantileTransform(df: DataFrame, groupCol: String, valueCol: String,
                        buckets: Int = 32, outCol: String = "q"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"quantileTransform output column '$outCol' already exists in the input; " +
        "pass a different outCol")
    import org.apache.spark.sql.expressions.Window
    // localCheckpoint pins the bucket ids: __b comes from
    // spark_partition_id over SAMPLED range boundaries, and byVal feeds
    // both the prefix table and the rank side — re-executing the exchange
    // (exchange reuse off, plan drift) could re-sample different
    // boundaries and desync __b between the two consumers. The pinned
    // object is the post-aggregate histogram, not corpus data.
    val byVal = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__n"))
      .repartitionByRange(buckets, col(groupCol), col(valueCol))
      .withColumn("__b", spark_partition_id())
      .localCheckpoint()
    val inBucket = Window.partitionBy(col("__b"), col(groupCol))
      .orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-(bucket, group) totals → per-group prefix over earlier buckets;
    // the window here runs over ≤ `buckets` rows per group, not the data
    val prefix = byVal.groupBy(col("__b"), col(groupCol))
      .agg(sum("__n").as("__bn"))
      .withColumn("__before", coalesce(sum(col("__bn")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col(groupCol), col("__before"))
    // totals fold the HISTOGRAM, not the corpus (the scan in step 1 is
    // the only corpus-sized pass); null-value rows are histogram rows
    // too, so n matches the window form's partition size exactly
    val totals = byVal.groupBy(col(groupCol)).agg(sum("__n").as("__total"))
    val ranked = byVal
      .withColumn("__cum", coalesce(sum(col("__n")).over(inBucket), lit(0L)))
      .join(prefix, Seq("__b", groupCol))
      .join(totals, Seq(groupCol))
      .select(col(groupCol), col(valueCol),
        // (rank−1)/(n−1): strictly-before count over n−1, the exact
        // operands PERCENT_RANK divides; 1-row groups → 0.0
        when(col("__total") === 1L, lit(0.0))
          .otherwise((col("__cum") + col("__before")).cast("double")
            / (col("__total") - 1L).cast("double")).as(outCol))
    df.join(ranked, Seq(groupCol, valueCol))
  }

  /** Upper-triangle Gram matrix XᵀX of a float-vector column — the
    * distributed core of scalable PCA / covariance / linear-regression
    * normal equations: n·d rows in, d(d+1)/2 cells out. The double
    * explode streams straight into a partial hash aggregate (d² groups
    * per partition, nothing materialized), so a 100 TB embedding scan
    * exchanges d²·partitions cells — the d×d result then fits on the
    * driver for the eigen/solve step, which is O(d³) and NOT a
    * distributed problem.
    *
    * Determinism: float×float in double is exact (24-bit mantissas);
    * each product rounds ONCE to the 10⁻⁹ grid and sums as exact decimal
    * (the q94 idiom — full-precision double→decimal casts disagree
    * between engines at the last ulp), so cells are order-,
    * partitioning-, and engine-independent, deterministic to 1e-9 per
    * product. Indices are 0-based. */
  def gramUpper(df: DataFrame, vec: Column): DataFrame =
    df.select(vec.as("__v"))
      .select(col("__v"), posexplode(col("__v")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("__v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum(round(col("xi").cast("double") * col("xj").cast("double"), 9)
        .cast("decimal(18,9)")).as("g"))
}
