package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model / dataset evaluation statistics computed distributively:
  * rank-based ROC AUC, equi-depth calibration bins, robust (median/MAD)
  * outlier flags, and the 2-D Pareto frontier (cost-vs-quality skyline of
  * candidate models or configs).
  *
  * All four are designed to be bit-identical across engines so they can
  * be oracled: AUC and NTILE rest on integer rank statistics (sums of
  * half-integers are exact doubles), MAD on exact median interpolation of
  * integers, and the skyline on pure comparisons.
  *
  * Scale shape: AUC's corpus-sized pass is a partial-aggregating groupBy
  * (its rank window sees only distinct scores per group); calibration
  * bins need a true global NTILE (single-partition window) with
  * [[Eval.equiDepthBinsApprox]] as the corpus-scale swap (sketch
  * boundaries + map-side assignment, giving up exact equal depth within
  * rank-error bounds); MAD is two exact-percentile passes per group; the
  * skyline is ONE dedup + ONE running-max window over distinct points,
  * O(n log n) where the textbook formulation is an O(n²) self-join.
  */
object Eval {

  /** Rank-based ROC AUC per group (Mann–Whitney U): with ascending score
    * ranks r_i averaged over ties,
    *
    *   AUC = (Σ_{i∈pos} r_i − n_pos(n_pos+1)/2) / (n_pos · n_neg)
    *
    * Tie handling via average ranks makes the result independent of any
    * ordering ambiguity, and every intermediate is a half-integer (exact
    * in doubles below 2^52), so the one final division is the only
    * rounding step — bit-identical on any engine and partitioning.
    *
    * Input: `df(groupCol, score double, label boolean-ish int)`. Output:
    * one row per group — n_pos, n_neg, auc. */
  def aucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                 labelCol: String): DataFrame = {
    // Aggregate to distinct (group, score) FIRST: the corpus-sized pass
    // is a plain partial-aggregating groupBy, and the rank window runs
    // over |distinct scores| rows, not |rows| — at 100 TB that's the
    // difference between a window over the corpus and one over a
    // per-group score histogram. Ranks come back as the cumulative count
    // of strictly-lower scores; a tie group of size n occupying ranks
    // cum+1 … cum+n has average rank cum + (n+1)/2 — a half-integer,
    // exact in doubles.
    val byScore = df.groupBy(col(groupCol), col(scoreCol))
      .agg(
        count(lit(1)).as("__n"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("__np"))
    val w = Window.partitionBy(groupCol).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("__avg_rank",
        coalesce(sum(col("__n")).over(w), lit(0L)) + (col("__n") + 1) / 2.0)
      .groupBy(col(groupCol))
      .agg(
        sum(col("__np")).as("n_pos"),
        (sum(col("__n")) - sum(col("__np"))).as("n_neg"),
        // Σ over tie groups of n_pos(s)·avg_rank(s): half-integer
        // products below 2^52 — exact, order-free
        sum(col("__np") * col("__avg_rank")).as("__pos_rank_sum"))
      .withColumn("auc",
        (col("__pos_rank_sum") - col("n_pos") * (col("n_pos") + 1) / 2.0)
          / (col("n_pos") * col("n_neg")))
      .drop("__pos_rank_sum")
  }

  /** Equi-depth (NTILE) binning of `valueCol` with per-bin summary — the
    * distributed reliability-diagram / feature-discretization primitive.
    * `tieBreak` must make the sort total or NTILE's bin boundaries are
    * ambiguous. Aggregates go through exact decimal sums (caller supplies
    * an exact-decimal view of the value). */
  def equiDepthBins(df: DataFrame, bins: Int, valueCol: Column,
                    decimalView: Column, tieBreak: Column): DataFrame = {
    val w = Window.orderBy(valueCol, tieBreak)
    df.withColumn("__bin", ntile(bins).over(w))
      .groupBy(col("__bin").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        min(valueCol).as("lo"),
        max(valueCol).as("hi"),
        (sum(decimalView).cast("double") / count(lit(1))).as("mean"))
  }

  /** Approximate equi-depth binning — the 100 TB path [[equiDepthBins]]'s
    * scaladoc promises: Greenwald–Khanna boundary sketch
    * (`percentile_approx`, rank error ≤ n/accuracy per boundary) + a
    * map-side bin assignment, so NO global single-partition NTILE window
    * ever runs. The boundary aggregate is one partial-aggregated exchange
    * of sketch state; assignment broadcasts the (bins−1)-element boundary
    * array and is pure column work; the per-bin summary is a plain
    * hash aggregate over `bins` groups.
    *
    * Contract vs the exact form: bin populations deviate from n/bins by
    * at most 2n/accuracy (two boundary rank errors), and values equal to
    * a boundary all land in the bin BELOW it (ties are never split the
    * way NTILE splits them — bin boundaries here are value-defined, so
    * equal values always share a bin; `tieBreak` is unnecessary). Under
    * heavy ties the sketch can return DUPLICATE boundary values (a value
    * holding more than 1/bins of the mass spans several nominal
    * boundaries); the bin ids those duplicates separate are then empty
    * and absent from the output, so the result may have FEWER than
    * `bins` rows — by construction, not by error: every row is still
    * counted exactly once in the bin its value falls in. Same output
    * schema as [[equiDepthBins]]. */
  def equiDepthBinsApprox(df: DataFrame, bins: Int, valueCol: Column,
                          decimalView: Column, accuracy: Int = 10000): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val ps = (1 until bins).map(_.toDouble / bins)
    // single-sourced GK invocation: stats/Approx owns the sketch call
    val bounds = graft.stats.Approx.percentiles(
        df.select(valueCol.as("__v")), "__v", ps, accuracy)
      .select(col("pcts").as("__bounds"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__bin",
        (size(filter(col("__bounds"), b => b < valueCol)) + 1).cast("int"))
      .groupBy(col("__bin").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        min(valueCol).as("lo"),
        max(valueCol).as("hi"),
        (sum(decimalView).cast("double") / count(lit(1))).as("mean"))
  }

  /** Robust per-group outlier summary: median, MAD (median absolute
    * deviation), and the count of points with |x − med| > k·MAD. Exact
    * `percentile(0.5)` on integer data yields half-integers, so every
    * comparison is exact. Two passes per group (median, then MAD) — each
    * a sort within the group's partition, no cross-group shuffle beyond
    * the groupBy. */
  def madOutliers(df: DataFrame, groupCol: String, xCol: String,
                  k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(xCol), lit(0.5)).as("med"))
    val dev = df.join(med, groupCol)
      .withColumn("__adev", abs(col(xCol) - col("med")))
    val mad = dev.groupBy(col(groupCol), col("med"))
      .agg(percentile(col("__adev"), lit(0.5)).as("mad"))
    dev.join(mad.select(col(groupCol), col("mad")), groupCol)
      .groupBy(col(groupCol), col("med"), col("mad"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__adev") > col("mad") * k, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** 2-D Pareto frontier over distinct (cost, gain) points: minimize
    * `costCol`, maximize `gainCol`. A point is dominated iff some other
    * point is ≤ cost and ≥ gain with one strict inequality.
    *
    * Sort + running-max replaces the quadratic NOT-EXISTS self-join:
    * after deduplication a point is on the frontier exactly when its gain
    * strictly exceeds every point preceding it under (cost asc, gain
    * desc) — preceding points all have ≤ cost, and equal-cost
    * higher-gain points sort first and correctly eliminate.
    *
    * The running max is computed WITHOUT a global single-partition
    * window: points are range-bucketed on cost (equal costs land in one
    * bucket, so cross-bucket comparisons are strict-< in cost), the
    * running max runs per bucket in parallel, and each bucket folds in
    * the prefix-max of all earlier buckets — a tiny bucket-count-sized
    * table. Same exact result, no corpus-sized data on one task. */
  def skyline2D(df: DataFrame, costCol: String, gainCol: String,
                buckets: Int = 32): DataFrame = {
    val pts = df.groupBy(col(costCol), col(gainCol))
      .agg(count(lit(1)).as("n_points"))
    // pinned for the same reason as Features.quantileTransform: __b is
    // sampled-boundary-dependent and stamped feeds both the prefix table
    // and the probe side — a re-executed exchange could desync them
    val stamped = pts.repartitionByRange(buckets, col(costCol))
      .withColumn("__b", spark_partition_id())
      .localCheckpoint()
    val inBucket = Window.partitionBy(col("__b"))
      .orderBy(col(costCol).asc, col(gainCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // bucket maxima → prefix max of strictly-earlier buckets (bucket
    // count rows: the single-partition window here is over ~`buckets`
    // rows, not the corpus)
    val prefix = stamped.groupBy(col("__b"))
      .agg(max(col(gainCol)).as("__bmax"))
      .withColumn("__prefix", max(col("__bmax")).over(
        Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__b"), col("__prefix"))
    stamped
      .withColumn("__prevmax", max(col(gainCol)).over(inBucket))
      .join(broadcast(prefix), "__b")
      .filter((col("__prevmax").isNull || col(gainCol) > col("__prevmax")) &&
        (col("__prefix").isNull || col(gainCol) > col("__prefix")))
      .select(col(costCol), col(gainCol), col("n_points"))
  }

  /** Winsorization: clip `value` to its per-group [pLo, pHi] exact
    * interpolated percentiles — the outlier treatment that keeps the row
    * (unlike filtering) while bounding its leverage. Two passes: a
    * per-group percentile aggregate (tiny result, Catalyst broadcasts
    * the join-back), then a map-side `least(greatest(...))` clip. Bounds
    * round to `roundDigits` so the clipped boundary values land on a
    * decimal grid (cross-engine portability; interior values pass
    * through untouched). At 100 TB swap the exact percentile for the GK
    * sketch (`stats/Approx`) — the clip plumbing is unchanged. */
  def winsorize(df: DataFrame, groupCol: String, value: Column,
                pLo: Double, pHi: Double, roundDigits: Int = 4): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val bounds = df.groupBy(col(groupCol)).agg(
      round(percentile(value, lit(pLo)), roundDigits).as("__lo"),
      round(percentile(value, lit(pHi)), roundDigits).as("__hi"))
    df.join(bounds, Seq(groupCol))
      .withColumn("clipped", least(greatest(value, col("__lo")), col("__hi")))
      .withColumn("was_clipped", value < col("__lo") || value > col("__hi"))
      .drop("__lo", "__hi")
  }

  /** Gains/lift table: rank rows by score (descending, ties broken by
    * `tieCol` for a total order), split into `buckets` equal-count
    * ranks (ntile), and report per bucket the positive count plus the
    * cumulative capture rate — "the top 20% of scores catches X% of all
    * positives", the model-triage artifact next to AUC (q128).
    *
    * Exactness: counts are longs; capture = cum_pos/total_pos and lift
    * = capture/(bucket/buckets) are single divisions of exact integers —
    * bit-portable. One window sort (the ranking IS a global sort — at
    * 100 TB score-bucket first via quantile split; here ntile keeps the
    * oracle trivially mirrorable). */
  def liftTable(df: DataFrame, scoreCol: Column, labelCol: Column,
                tieCol: Column, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val ranked = df.select(scoreCol.as("__s"), labelCol.cast("long").as("__y"),
        tieCol.as("__t"))
      .withColumn("__b", ntile(buckets).over(
        Window.orderBy(col("__s").desc, col("__t"))))
    val per = ranked.groupBy(col("__b").as("bucket"))
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"))
    liftFromBucketCounts(per)
  }

  /** Shared tail of [[liftTable]]/[[liftTableApprox]]: cumulative capture
    * / depth / lift from per-bucket (n, n_pos) counts. The windows here
    * run over ≤ `buckets` rows — never corpus data. */
  private def liftFromBucketCounts(per: DataFrame): DataFrame = {
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("cum_pos", sum("n_pos").over(w))
      .withColumn("total_pos", sum("n_pos").over(all))
      // depth = ACTUAL cumulative row fraction, not bucket/buckets: ntile
      // front-loads remainder rows, so the nominal fraction overstates
      // lift whenever row count is not divisible by the bucket count
      .withColumn("cum_n", sum("n").over(w))
      .withColumn("total_n", sum("n").over(all))
      .withColumn("capture", col("cum_pos").cast("double") / col("total_pos").cast("double"))
      .withColumn("depth", col("cum_n").cast("double") / col("total_n").cast("double"))
      .withColumn("lift", col("capture") / col("depth"))
      .select(col("bucket"), col("n"), col("n_pos"), col("cum_pos"),
        col("capture"), col("depth"), col("lift"))
  }

  /** Approximate gains/lift table — [[liftTable]]'s 100 TB path, the same
    * swap [[equiDepthBinsApprox]] makes for [[equiDepthBins]]: score
    * buckets come from a Greenwald–Khanna quantile sketch
    * (`percentile_approx`, rank error ≤ n/accuracy per boundary) and rows
    * are assigned map-side against the broadcast (buckets−1)-element
    * boundary array — NO global single-partition NTILE window ever runs.
    * The corpus-sized passes are one sketch aggregate and one
    * hash-aggregating bucket count; everything after runs over ≤
    * `buckets` rows.
    *
    * Contract vs the exact form: bucket 1 is still the highest scores;
    * bucket populations deviate from n/buckets by at most two boundary
    * rank errors (2n/accuracy); rows with a score EQUAL to a boundary all
    * land in the higher-score bucket (value-defined boundaries never
    * split ties, so no tie column is needed — and as with
    * [[equiDepthBinsApprox]], duplicate boundaries under heavy ties leave
    * the bucket ids between them empty, so the output may have fewer than
    * `buckets` rows). `capture`/`depth`/`lift` stay exact for the
    * realized buckets: they divide exact long counts of the actual
    * assignment. Same output schema as [[liftTable]]. */
  def liftTableApprox(df: DataFrame, scoreCol: Column, labelCol: Column,
                      buckets: Int = 10, accuracy: Int = 10000): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val base = df.select(scoreCol.as("__s"), labelCol.cast("long").as("__y"))
    val ps = (1 until buckets).map(_.toDouble / buckets)
    // boundaries ascending at ranks n/buckets … (buckets-1)n/buckets;
    // a score above m of them sits in descending bucket (buckets − m)
    val bounds = graft.stats.Approx.percentiles(
        base.select(col("__s").as("__v")), "__v", ps, accuracy)
      .select(col("pcts").as("__bounds"))
    val per = base.crossJoin(broadcast(bounds))
      .withColumn("__b",
        (lit(buckets) - size(filter(col("__bounds"), b => b < col("__s")))).cast("int"))
      .groupBy(col("__b").as("bucket"))
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"))
    liftFromBucketCounts(per)
  }

  /** Exact weighted median per group: the smallest value whose running
    * weight (ordered by value, ties by value only — equal values share a
    * cumulative position, so no tie-break column is needed) reaches half
    * the group's total. Weights canonicalize to exact decimals: the
    * half-total comparison `2·cumw ≥ total` is integer-scaled decimal
    * arithmetic — no doubles anywhere, bit-portable. Null values or
    * weights drop; groups with no positive weight are absent. The
    * weighted generalization of the q59/q134 exact quantiles —
    * lower-median convention.
    *
    * Plan (the q162 histogram reduction): weights pre-aggregate to the
    * DISTINCT (group, value) histogram first — a partial hash aggregate,
    * the only corpus-sized pass — and the running/total-weight windows
    * run over histogram rows. The row-level window form partitioned by
    * the group column alone (corpus/|groups| rows through ONE task per
    * group at scale — q157's 3 return flags are corpus thirds); the
    * histogram form's window groups are |distinct values| wide instead
    * (50 quantity grid points here). Equivalence is exact: the original
    * RANGE frame already gave every tied value the same cumulative
    * weight, which is precisely the per-distinct-value running sum, and
    * decimal sums are associative. The residual bound — a group's window
    * is its distinct-VALUE count — is the quantileTransform contract;
    * bucket further (q183's grid) only if values are continuous. */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: Column,
                     weightCol: Column): DataFrame = {
    val base = df
      .select(col(groupCol), valueCol.as("__v"),
        weightCol.cast("decimal(18,6)").as("__w"))
      .filter(col("__v").isNotNull && col("__w").isNotNull && col("__w") > 0)
    val hist = base.groupBy(col(groupCol), col("__v"))
      .agg(sum(col("__w")).as("__wv"))
    // ROWS frame is now exact: histogram values are distinct per group
    val w = Window.partitionBy(groupCol).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(groupCol)
    hist
      .withColumn("__cumw", sum(col("__wv")).over(w))
      .withColumn("__tot", sum(col("__wv")).over(tot))
      .filter(col("__cumw") * 2 >= col("__tot"))
      .groupBy(col(groupCol))
      .agg(min(col("__v")).as("weighted_median"),
        max(col("__tot")).cast("double").as("total_weight"))
  }

  /** kNN label-accuracy probe — the standard embedding-quality eval for
    * curation (does the embedding space separate the labels a downstream
    * selector relies on?): for a deterministic query sample
    * (id ≡ 0 mod `sampleMod`), predict each query's label as the
    * majority label of its k nearest neighbours (cosine, self excluded,
    * vote ties to the smallest label) and report per-label
    * (n_queries, n_correct).
    *
    * Plan: the scoring pass is [[Similarity.bruteForceTopK]] — queries
    * broadcast, the bounded TopK aggregate keeps ≤ k pairs per
    * (partition, query) on the exchange. Brute force is exact and right
    * while the sample is small; at corpus scale swap the scorer for
    * [[Similarity.multiProbeTopK]] (same output contract) and this
    * operator's vote/report tail is unchanged. Votes are integer counts;
    * the argmax is the map-side `max(struct(cnt, -label))` idiom — no
    * per-query window. */
  def knnLabelAccuracy(emb: DataFrame, k: Int, sampleMod: Long = 10,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       labelCol: String = "label"): DataFrame = {
    require(k >= 1 && sampleMod >= 1)
    val queries = emb.filter(pmod(col(idCol), lit(sampleMod)) === 0)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"),
        col(labelCol).as("__qlabel"))
    // the scoring stage does |corpus|·|sample| cosines — spread it over
    // the full parallelism, not the corpus scan's split count (the q140
    // collapse class, measured live at sf10: 4e9 cosines on ~3 tasks)
    val top = Similarity.bruteForceTopK(emb, queries.select("qid", "qvec"), k,
      id = idCol, vec = vecCol,
      scanParallelism = emb.sparkSession.sparkContext.defaultParallelism)
    // the corpus-sized label table STREAMS; the sample×k top table is the
    // broadcast side (broadcasting labels would be corpus-width)
    val pred = emb
      .select(col(idCol).as("neighbor"), col(labelCol).cast("long").as("__nl"))
      .join(broadcast(top), "neighbor")
      .groupBy(col("qid"), col("__nl"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy("qid")
      .agg(max(struct(col("__cnt"), (-col("__nl")).as("__neg"))).as("__m"))
      .select(col("qid"), (-col("__m.__neg")).as("__pred"))
    queries.join(pred, "qid")
      .groupBy(col("__qlabel").as(labelCol))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("__pred") === col("__qlabel").cast("long"), 1L)
          .otherwise(0L)).as("n_correct"))
  }

  /** ROUGE-N per (candidate, reference) text pair — the n-gram-overlap
    * generation metric (Lin 2004, "ROUGE: A Package for Automatic
    * Evaluation of Summaries"), with the standard CLIPPED counts: each
    * n-gram contributes min(count in candidate, count in reference).
    *
    *   recall    = overlap / |reference n-grams|      (ROUGE-N proper)
    *   precision = overlap / |candidate n-grams|
    *   f1        = 2·overlap / (|cand| + |ref|)       (≡ 2PR/(P+R))
    *
    * The f1 identity avoids composing two quotients — ONE division of
    * exact integers per row, so all three scores are single correctly-
    * rounded IEEE divides, bit-identical across engines with no rounding
    * grid. Zero-gram sides yield null for the affected score, not ÷0.
    *
    * Scale shape: both texts tokenize map-side into (pair, gram, count)
    * partial aggregates; the one exchange carries gram rows keyed by
    * (pair_id, gram) — every group is bounded by a single PAIR's grams,
    * so there is no corpus-wide hot key (contrast the model-attach
    * family, which keys by token across the corpus and needs the
    * skew-safe twin). The full-outer gram join is per-pair co-partitioned
    * by the same key. Pairs where BOTH sides have < n tokens produce the
    * (0, 0, 0, null, null, null) row via the left join back to the pair
    * universe — they must not silently vanish from an eval report.
    *
    * @param pairs  one row per evaluation pair
    * @param idCol  pair key column name
    * @param n      n-gram order (1 = unigram ROUGE-1, 2 = ROUGE-2, ...)
    */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String, refCol: String,
             n: Int): DataFrame = {
    require(n >= 1 && n <= 8, s"n-gram order outside [1,8]: $n")
    def gramCounts(textCol: String, cntName: String): DataFrame =
      pairs.select(col(idCol), explode(graft.functions.Text.shingles(col(textCol), n)).as("__g"))
        .groupBy(col(idCol), col("__g"))
        .agg(count(lit(1)).as(cntName))
    val cg = gramCounts(candCol, "__cc")
    val rg = gramCounts(refCol, "__rc")
    val overlap = cg.join(rg, Seq(idCol, "__g"), "full_outer")
      .groupBy(col(idCol))
      .agg(
        sum(least(coalesce(col("__cc"), lit(0L)), coalesce(col("__rc"), lit(0L)))).as("n_overlap"),
        sum(coalesce(col("__cc"), lit(0L))).as("n_cand"),
        sum(coalesce(col("__rc"), lit(0L))).as("n_ref"))
    pairs.select(col(idCol)).join(overlap, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"))
      .withColumn("precision",
        when(col("n_cand") > 0, col("n_overlap").cast("double") / col("n_cand")))
      .withColumn("recall",
        when(col("n_ref") > 0, col("n_overlap").cast("double") / col("n_ref")))
      .withColumn("f1",
        when(col("n_cand") + col("n_ref") > 0,
          lit(2.0) * col("n_overlap") / (col("n_cand") + col("n_ref"))))
  }
}
