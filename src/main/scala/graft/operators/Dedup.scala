package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Seeds, Text}

/** A dedup result plus the persisted intermediates backing it. The pair
  * plans cache their shingle/signature tables (consumed by several plan
  * branches); those caches must outlive every action on `pairs` but should
  * not outlive the RESULT — `materialize` scopes them to one consumption,
  * `unpersistCaches` releases them explicitly for multi-action use. */
final class DedupRun(val pairs: DataFrame, caches: Seq[DataFrame]) {
  /** Run `f` (which should materialize `pairs`), then drop the caches. */
  def materialize[T](f: DataFrame => T): T =
    try f(pairs) finally unpersistCaches()
  def unpersistCaches(): Unit = caches.foreach(_.unpersist(false))
}

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB regime:
  *
  *   - exact: hash-groupBy on a content digest — one shuffle of digests,
  *     never of document bodies.
  *   - MinHash+LSH: shingle → k minhashes → band buckets → candidate
  *     pairs only within buckets → exact-Jaccard verify. The candidate
  *     join is the only quadratic step and it is quadratic per *bucket*,
  *     not per corpus.
  *   - SimHash: 64-bit signature, near-dup = small Hamming distance;
  *     banding on signature bytes gives the same bucketed-join shape.
  *   - n-gram Jaccard: the exact verifier, also usable standalone inside
  *     explicit blocks.
  *
  * All hashing is xxhash64 (Spark builtin, codegen'd, deterministic across
  * runs and partitionings — a hard requirement for reproducible dedup).
  */
object Dedup {

  /** Content digest for exact dedup. md5 keeps DuckDB-oracle parity;
    * xxhash64 is the cheaper production digest (collision risk 2^-64/pair). */
  def digest(text: Column): Column = md5(text)

  /** Exact duplicate groups: one row per distinct content, with the
    * representative (minimum) id and the multiplicity. */
  def exactGroups(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.groupBy(digest(col(text)).as("content_hash"))
      .agg(min(col(id)).as("rep_id"), count(lit(1)).as("n_copies"))

  /** Incremental (batch-vs-corpus) exact dedup — the continuous-ingest
    * shape: of a new `batch`, keep one representative (minimum id) per
    * content digest AND drop every digest already present in `corpus`.
    * `digestExpr` is any deterministic digest over the document columns
    * ([[digest]] for true content identity; a weaker digest — e.g. a text
    * prefix — for near-identity blocking).
    *
    * Scale: both sides reduce to digest-only projections before touching
    * each other — the batch side partial-aggregates (digest, min id)
    * map-side, the corpus side is a digest `distinct`, and the anti-join
    * shuffles digests, never bodies. At 100 TB the corpus digest set is
    * what a production pipeline would persist between ingests (or carry
    * as the [[Sketches]] Bloom filter when false-drops are acceptable —
    * q125's pattern); this operator is the exact form of that contract. */
  def incrementalNew(batch: DataFrame, corpus: DataFrame, digestExpr: Column,
                     id: String = "doc_id"): DataFrame = {
    val b = batch.select(col(id), digestExpr.as("__h"))
      .groupBy(col("__h")).agg(min(col(id)).as(id))
    val c = corpus.select(digestExpr.as("__h")).distinct()
    b.join(c, Seq("__h"), "left_anti").select(col(id))
  }

  /** Incremental batch-vs-corpus NEAR-dup filter — the production shape
    * of MinHash-LSH dedup: a new ingest batch probes the existing
    * corpus' band index instead of re-pairing the whole corpus
    * ([[incrementalNew]] is the exact-digest twin, q166). A batch
    * document is dropped when it has a verified Jaccard ≥ `threshold`
    * match (a) anywhere in the corpus, or (b) with any SMALLER-id batch
    * document — pairwise dominance, deliberately NOT the transitive
    * closure: a deterministic one-pass rule (conservative next to the
    * sequential keep-greedy — a doc dominated only by an itself-dropped
    * doc still drops), order-free and engine-re-derivable.
    *
    * Scale: the corpus side contributes its band table (in production,
    * pre-materialized once and reused per batch) and its hashed shingle
    * sets only for verify candidates — corpus text never pairs with
    * itself, so the work is |batch-candidates|, not corpus². Band
    * buckets over `maxBucket` drop before probing (the
    * [[minhashLshRun]] hot-bucket guard, applied per side). Batch
    * documents with no shingles (shorter than the gram width) are kept
    * trivially, mirroring the pair builders. */
  def incrementalNearDupNew(batch: DataFrame, corpus: DataFrame,
                            id: String = "doc_id", text: String = "text",
                            shingleN: Int = 3, k: Int = 64, rowsPerBand: Int = 4,
                            threshold: Double = 0.8, maxBucket: Long = 0L): DataFrame =
    incrementalNearDupNewRun(batch, corpus, id, text, shingleN, k, rowsPerBand,
      threshold, maxBucket).pairs

  /** Handle-returning variant of [[incrementalNearDupNew]] — see
    * [[DedupRun]] (`pairs` here is the kept-ids frame). The batch and
    * corpus shingle caches are consumed by the band build AND the verify
    * joins; without the handle a long-lived session leaks both cached
    * tables per call (`unpersistCaches` / `materialize` releases them,
    * as does the harnesses' per-query `catalog.clearCache()`). */
  def incrementalNearDupNewRun(batch: DataFrame, corpus: DataFrame,
                               id: String = "doc_id", text: String = "text",
                               shingleN: Int = 3, k: Int = 64, rowsPerBand: Int = 4,
                               threshold: Double = 0.8, maxBucket: Long = 0L): DedupRun = {
    val dp = batch.sparkSession.sparkContext.defaultParallelism
    def shingled(df: DataFrame) = df
      .repartition(dp)
      .select(col(id).as("__id"),
        array_distinct(Text.shingles(col(text), shingleN)).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .withColumn("__bh", transform(col("__sh"), s => xxhash64(s)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def banded(sh: DataFrame) = {
      val all = sh
        .withColumn("__mh", minhashes(col("__bh"), k))
        .select(col("__id"), explode(bandKeys(col("__mh"), k, rowsPerBand)).as("__band"))
      if (maxBucket <= 0) all
      else {
        val hot = all.groupBy("__band").count()
          .filter(col("count") > maxBucket).select("__band")
        all.join(broadcast(hot), Seq("__band"), "left_anti")
      }
    }
    val bsh = shingled(batch)
    val csh = shingled(corpus)
    val bb = banded(bsh)
    val cb = banded(csh)

    def verified(cands: DataFrame, rightSh: DataFrame) = cands
      .join(bsh.select(col("__id").as("id_a"), col("__bh").as("sh_a")), "id_a")
      .join(rightSh.select(col("__id").as("id_b"), col("__bh").as("sh_b")), "id_b")
      .filter(jaccard(col("sh_a"), col("sh_b")) >= threshold)

    // (a) batch → corpus probe
    val corpusCands = bb.select(col("__band"), col("__id").as("id_a"))
      .join(cb.select(col("__band"), col("__id").as("id_b")), "__band")
      .select("id_a", "id_b").distinct()
    val hitCorpus = verified(corpusCands, csh).select(col("id_a").as(id)).distinct()

    // (b) within-batch dominance by any smaller id
    val a = bb.select(col("__band").as("__ba"), col("__id").as("id_a"))
    val b = bb.select(col("__band").as("__bb"), col("__id").as("id_b"))
    val batchCands = a.join(b, col("__ba") === col("__bb") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val dominated = verified(batchCands, bsh).select(col("id_b").as(id)).distinct()

    val kept = batch.select(col(id))
      .join(hitCorpus, Seq(id), "left_anti")
      .join(dominated, Seq(id), "left_anti")
    new DedupRun(kept, Seq(bsh, csh))
  }

  /** Exact-dedup projection: keep only the representative row per content
    * group — the distributed `DISTINCT ON (content)`. */
  def exactDedup(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(digest(col(text))).orderBy(col(id))
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** k deterministic minhash values from a PRE-HASHED shingle array
    * (`baseHashes` = one xxhash64 per distinct shingle). Each variable-
    * length shingle string is hashed ONCE; the k permutations re-hash the
    * resulting fixed-width long (seeded xxhash64) — ~k× cheaper than k
    * string-hash passes, and overflow-free under ANSI mode (a wrapping
    * linear-congruential family would need non-ANSI multiply).
    *
    * Implemented as a native single-pass Expression (HashKernels) —
    * bit-identical to the `array((0 until k).map(i => array_min(transform(
    * bh, h => xxhash64(lit(i), h)))))` builtin chain for NON-EMPTY inputs
    * (empty → null here vs k nulls there; filter empty shingle sets first,
    * as the pair builders do), without the k intermediate arrays and k
    * re-walks. */
  def minhashes(baseHashes: Column, k: Int): Column =
    graft.functions.HashKernels.minhashesCol(baseHashes, k)

  /** LSH band keys: split the k minhashes into bands of `rowsPerBand` and
    * hash each band — docs sharing any band key are candidates. */
  def bandKeys(minhashCol: Column, k: Int, rowsPerBand: Int): Column = {
    require(k % rowsPerBand == 0)
    array((0 until k / rowsPerBand).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(slice(minhashCol, b * rowsPerBand + 1, rowsPerBand)).as("h"))
    }: _*)
  }

  /** Exact Jaccard similarity of two (already distinct) arrays. Integer
    * set sizes → exact double division, engine-independent. Single
    * intersect: |A∪B| = |A|+|B|−|A∩B| (half the set-op cost of
    * intersect+union on the pair-verification hot path). */
  def jaccard(a: Column, b: Column): Column = {
    val i = size(array_intersect(a, b))
    i.cast("double") / (size(a) + size(b) - i)
  }

  /** MinHash-LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * @param k          minhash count (default 64)
    * @param rowsPerBand band size r; recall for similarity s is
    *                   1-(1-s^r)^(k/r) — r=4,b=16 catches s≥0.8 w.p. >0.999
    * @param threshold  exact-Jaccard acceptance threshold on shingle sets
    *
    * Pipeline: shingle → minhash → explode band keys → self-join per
    * bucket (id< id dedups the pair space) → distinct pairs → verify.
    * Only signatures and ids shuffle; document text never does.
    */
  def minhashLshPairs(docs: DataFrame, id: String = "doc_id", text: String = "text",
                      shingleN: Int = 3, k: Int = 64, rowsPerBand: Int = 4,
                      threshold: Double = 0.8, maxBucket: Long = 0L): DataFrame =
    minhashLshRun(docs, id, text, shingleN, k, rowsPerBand, threshold, maxBucket).pairs

  /** Handle-returning variant of [[minhashLshPairs]]: `run.materialize(f)`
    * consumes the pairs and releases the intermediate cache in one scope
    * (no lingering cached relations — asserted in `DataPipelineSpec`).
    *
    * `maxBucket > 0` drops band buckets holding more than that many
    * documents BEFORE the candidate self-join — the standard hot-bucket
    * mitigation at corpus scale, where a degenerate band (boilerplate,
    * stopword shingles, near-empty docs) otherwise contributes |bucket|²/2
    * candidate pairs on one key. The trade is explicit, bounded recall
    * loss: a true near-dup pair is missed only if EVERY band it shares is
    * over the cap (mega-cluster members — which exact-dedup or a length
    * gate should have removed first). 0 = unlimited (exact-recall mode,
    * the q36 oracle contract). */
  def minhashLshRun(docs: DataFrame, id: String = "doc_id", text: String = "text",
                    shingleN: Int = 3, k: Int = 64, rowsPerBand: Int = 4,
                    threshold: Double = 0.8, maxBucket: Long = 0L): DedupRun = {
    // 1. shingle sets + one base hash per shingle (hashed once, reused k×).
    //    Repartition first: tokenization/hashing is CPU-bound per doc, and a
    //    compact parquet input (one row group) would otherwise pin the whole
    //    corpus to one task regardless of cores.
    //    The hash table is consumed 3× in this plan (banding + both verify
    //    sides) — persist it so shingling/hashing runs once per document,
    //    not once per consumer. MEMORY_AND_DISK: at corpus scale the table
    //    spills instead of recomputing (same choice as Spark ML's
    //    MinHashLSHModel); in a staged pipeline, checkpoint via
    //    `Pipeline.stage` instead and drop this cache. The cache lives
    //    until `DedupRun.unpersistCaches` (or catalog.clearCache(), which
    //    Bench and Verify run per query).
    val sh = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(
        col(id).as("__id"),
        array_distinct(Text.shingles(col(text), shingleN)).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .withColumn("__bh", transform(col("__sh"), s => xxhash64(s)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 2. band keys only — signatures and shingles do NOT ride the explode
    val allBands = sh
      .withColumn("__mh", minhashes(col("__bh"), k))
      .select(col("__id"), explode(bandKeys(col("__mh"), k, rowsPerBand)).as("__band"))
    // hot-bucket guard: one partial-aggregated count per band key, hot
    // keys dropped via broadcast anti-join (the hot set is tiny by
    // construction — it's the degenerate tail)
    val banded =
      if (maxBucket <= 0) allBands
      else {
        val hot = allBands.groupBy("__band").count()
          .filter(col("count") > maxBucket).select("__band")
        allBands.join(broadcast(hot), Seq("__band"), "left_anti")
      }
    // 3. candidate pairs: bucket self-join on (band idx, band hash), then
    //    DISTINCT before any verification — a pair sharing m bands must be
    //    verified once, not m times
    val a = banded.select(col("__band").as("band_a"), col("__id").as("id_a"))
    val b = banded.select(col("__band").as("band_b"), col("__id").as("id_b"))
    val candidates = a.join(b, col("band_a") === col("band_b") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // 4. exact-Jaccard verify on the HASHED sets: set algebra over fixed
    //    longs instead of variable strings (same counts barring 2^-64
    //    collisions); each document's set shuffles once per side — never
    //    k× through the bands
    val shA = sh.select(col("__id").as("id_a"), col("__bh").as("sh_a"))
    val shB = sh.select(col("__id").as("id_b"), col("__bh").as("sh_b"))
    val pairs = candidates.join(shA, "id_a").join(shB, "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= threshold)
    new DedupRun(pairs, Seq(sh))
  }

  /** 64-bit SimHash of a token-hash array: per-bit majority vote over the
    * per-token xxhash64 values (ties set the bit). Native single-pass
    * Expression (HashKernels) — replaces 64 `aggregate` bit-fold passes
    * with one walk of the hash array; values are identical. */
  def simhashFromHashes(hashesCol: Column): Column =
    graft.functions.HashKernels.simhash64Col(hashesCol)

  def simhash(tokensCol: Column): Column =
    simhashFromHashes(transform(tokensCol, t => xxhash64(t)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the signature into 4×16-bit chunks
    * (any pair within Hamming ≤ 3 shares at least one exact chunk —
    * pigeonhole), bucket-join on chunks, verify by full Hamming.
    *
    * Recall is EXACT (the pigeonhole is deterministic, not probabilistic),
    * so the result equals the all-pairs Hamming filter — which is what the
    * q37 oracle checks.
    *
    * Scale ceiling + fix: chunk keys are 16-bit, so an UNBLOCKED corpus has
    * at most 4×65,536 buckets and candidate pairs grow ~n²/2¹⁸ — fine at
    * millions of docs, quadratic at billions. `blockCols` composes cheap
    * blocking keys (language, length bucket, source) into the bucket key:
    * buckets become 4×65,536×|blocks| and only same-block pairs are
    * emitted — the same recall trade `blockedJaccardPairs` makes, with the
    * cardinality math recorded in SCALE.md.
    *
    * `portable = true` derives token hashes from md5 lower-64
    * (`Seeds.portableHash64`) instead of xxhash64 — slower, but any engine
    * with md5 reproduces the signatures bit-for-bit (the DuckDB oracle
    * re-derives them from hex digits). Documents with no tokens are
    * excluded (an empty token multiset has no meaningful signature; the
    * majority vote would give all-ones). */
  def simhashPairs(docs: DataFrame, id: String = "doc_id", text: String = "text",
                   maxHamming: Int = 3, blockCols: Seq[String] = Nil,
                   portable: Boolean = false): DataFrame =
    simhashRun(docs, id, text, maxHamming, blockCols, portable).pairs

  /** Handle-returning variant of [[simhashPairs]] — see [[DedupRun]]. */
  def simhashRun(docs: DataFrame, id: String = "doc_id", text: String = "text",
                 maxHamming: Int = 3, blockCols: Seq[String] = Nil,
                 portable: Boolean = false): DedupRun = {
    val tokenHash: Column => Column =
      if (portable) Seeds.portableHash64 else (t => xxhash64(t))
    // token hashes materialized once; the 64 bit-folds then reuse them
    // persist: the 64-bit-fold signature is consumed by both join sides;
    // without the cache it is computed twice per document. Released by
    // DedupRun.unpersistCaches / the harnesses' per-query clearCache().
    val sigs = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select((blockCols.map(col) :+ col(id).as("__id") :+
        transform(Text.tokens(col(text)), tokenHash).as("__th")): _*)
      .filter(size(col("__th")) > 0)
      .withColumn("__sig", simhashFromHashes(col("__th"))).drop("__th")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // signatures are 8 bytes — carry them through the chunk explode rather
    // than re-joining (which would recompute the 64-fold signature once per
    // join consumer); distinct dedups pairs sharing several chunks. Block
    // values ride inside the bucket struct so the join stays single-key.
    val blockFields = blockCols.zipWithIndex.map { case (c, i) => col(c).as(s"b$i") }
    val chunked = sigs.select(col("__id"), col("__sig"),
      explode(array((0 until 4).map(i =>
        struct(blockFields :+ lit(i).as("i") :+
          shiftright(col("__sig"), i * 16).bitwiseAND(0xFFFFL).as("c"): _*)): _*)).as("__chunk"))
    val a = chunked.select(col("__chunk").as("chunk_a"), col("__id").as("id_a"), col("__sig").as("sig_a"))
    val b = chunked.select(col("__chunk").as("chunk_b"), col("__id").as("id_b"), col("__sig").as("sig_b"))
    val pairs = a.join(b, col("chunk_a") === col("chunk_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sig_a"), col("sig_b")).as("dist"))
      .filter(col("dist") <= maxHamming)
      .distinct()
    new DedupRun(pairs, Seq(sigs))
  }

  /** Hamming near-dup pairs for ANY precomputed 64-bit signature table —
    * the [[simhashPairs]] chunk banding exposed for signatures that do
    * not come from text (perceptual image hashes from
    * `Multimodal.imageAHashBatch`, audio fingerprints, …), generalized to
    * ANY radius: the 64 bits split into `maxHamming + 1` chunks of
    * ⌈64/(h+1)⌉ bits (the last chunk narrower when they don't divide
    * evenly), bucket-join on equal chunks, full-Hamming verify. Recall is
    * pigeonhole-EXACT for every h — h differing bits can dirty at most h
    * of the h+1 chunks, so every true pair shares ≥ 1 chunk verbatim.
    *
    * Scale math (the parameter's REAL cost): with chunk width
    * w = ⌈64/(h+1)⌉ an unblocked corpus forms ~(h+1)·n²/2ʷ⁺¹ candidate
    * pairs — h=3 ⇒ 16-bit keys (the simhash regime), h=8 ⇒ 8-bit keys
    * (the perceptual-image operating point, 256 buckets per chunk slot),
    * h=15 ⇒ 4-bit keys. Past h≈8 the chunk keys alone no longer prune at
    * corpus scale; compose a blocking key upstream (near-dup images are
    * same-dimensions/same-format in practice) exactly as
    * `simhashPairs(blockCols)` does — the cap below fails fast where even
    * blocked banding stops making sense. */
  def signaturePairs(sigs: DataFrame, maxHamming: Int = 3,
                     id: String = "doc_id", sig: String = "sig"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming > 15 means chunk keys under 4 bits - banding cannot prune: $maxHamming")
    val nChunks = maxHamming + 1
    // partition the 64 bits into nChunks NON-EMPTY spans (the first
    // 64 mod n chunks one bit wider) — a naive ⌈64/n⌉ stride leaves a
    // zero-width tail chunk whenever n ∤ 64 crosses the boundary (n = 9:
    // offsets 0,8,…,64), and an always-equal empty key silently
    // degenerates the band join to ALL-PAIRS
    val widths = Array.tabulate(nChunks)(i => 64 / nChunks + (if (i < 64 % nChunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val base = sigs.select(col(id).as("__id"), col(sig).as("__sig"))
    val chunked = base.select(col("__id"), col("__sig"),
      explode(array((0 until nChunks).map { i =>
        // width == 64 only for h = 0 (one chunk = the whole signature);
        // (1L << 64) - 1 would be 0 under JVM shift-mod-64, so skip the mask
        val c = if (widths(i) == 64) col("__sig")
          else shiftright(col("__sig"), offsets(i)).bitwiseAND(lit((1L << widths(i)) - 1))
        struct(lit(i).as("i"), c.as("c"))
      }: _*)).as("__chunk"))
    val a = chunked.select(col("__chunk").as("chunk_a"), col("__id").as("id_a"), col("__sig").as("sig_a"))
    val b = chunked.select(col("__chunk").as("chunk_b"), col("__id").as("id_b"), col("__sig").as("sig_b"))
    a.join(b, col("chunk_a") === col("chunk_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sig_a"), col("sig_b")).as("dist"))
      .filter(col("dist") <= maxHamming)
      .distinct()
  }

  /** Connected components over near-dup pairs: dedup at corpus scale ends
    * with CLUSTERS (keep one representative per component), not pairs —
    * a pair list where A~B and B~C must collapse {A,B,C} together.
    *
    * Min-label propagation: every node repeatedly takes the minimum id
    * among itself and its neighbors until a fixpoint. Each iteration is
    * one key-shuffle join; the iteration count is the graph diameter, and
    * near-dup graphs are unions of stars/cliques with tiny diameters, so
    * 2–3 rounds in practice. `localCheckpoint` truncates the plan lineage
    * each round — without it the loop compiles an ever-growing DAG.
    *
    * Returns (id, component) with component = min id in the cluster; docs
    * absent from `pairs` are their own components and are not emitted.
    *
    * Throws IllegalStateException if the fixpoint is not reached within
    * `maxIters` — truncated labels are NOT valid components and silently
    * returning them would under-merge clusters. */
  def components(pairs: DataFrame, a: String = "id_a", b: String = "id_b",
                 maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min("component").as("nmin"))
      val next = labels.join(neighborMin, labels("id") === col("src"), "left")
        .select(labels("id"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old")).count()
      labels = next
      it += 1
    }
    edges.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"components() did not converge in $maxIters iterations " +
          s"($changed labels still changing); raise maxIters")
    labels
  }

  /** Exact n-gram-Jaccard pairs within explicit blocks (e.g. language ×
    * source) — the blocked-dedup baseline and the oracle for the
    * probabilistic variants. */
  def blockedJaccardPairs(docs: DataFrame, blockCols: Seq[String],
                          id: String = "doc_id", text: String = "text",
                          shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(
      (blockCols.map(col) :+ col(id).as("__id") :+
        array_distinct(Text.shingles(col(text), shingleN)).as("__sh")): _*)
    val a = sh.select(blockCols.map(c => col(c).as(s"${c}_a")) :+ col("__id").as("id_a") :+ col("__sh").as("sh_a"): _*)
    val b = sh.select(blockCols.map(c => col(c).as(s"${c}_b")) :+ col("__id").as("id_b") :+ col("__sh").as("sh_b"): _*)
    a.join(b, blockCols.map(c => col(s"${c}_a") === col(s"${c}_b")).reduce(_ && _) && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** EXACT Jaccard-threshold pairs with NO blocking recall loss — prefix
    * filtering (the AllPairs/PPJoin family). Each document's distinct
    * shingles sort in one GLOBAL canonical order (document frequency
    * ascending, ties by token): a pair with Jaccard ≥ t = num/den MUST
    * share a token inside each side's first |d| − ⌈t·|d|⌉ + 1 tokens —
    * if all shared tokens sat in the suffix of length ⌈t·|d|⌉ − 1, then
    * |A∩B| ≤ ⌈t·|d|⌉ − 1 < t·|d| ≤ t·|A∪B| ≤ |A∩B|, a contradiction.
    * So the candidate join runs on PREFIX tokens only, and rarest-first
    * ordering puts the lowest-fanout tokens in the prefixes — the
    * candidate set shrinks to near the true pair count while recall
    * stays exactly 1 (the guarantee LSH trades away). Verification is an
    * integer cross-multiplied comparison (den·∩ ≥ num·∪): no FP
    * threshold wobble. Scale: the df table is a broadcast join; only
    * candidate pairs ever carry full shingle arrays; threshold acts on
    * prefix-index size as Σ(1−t)|d|, so higher thresholds cost less. */
  def prefixFilteredJaccardPairs(docs: DataFrame, id: String = "doc_id",
                                 text: String = "text", shingleN: Int = 3,
                                 thresholdNum: Int = 1, thresholdDen: Int = 2): DataFrame = {
    require(thresholdNum > 0 && thresholdDen >= thresholdNum)
    val sh = docs.select(col(id).as("__id"),
      explode(array_distinct(Text.shingles(col(text), shingleN))).as("tok"))
    val dfTab = sh.groupBy("tok").agg(count(lit(1)).as("df"))
    val docSets = sh.join(broadcast(dfTab), Seq("tok"))
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ts"))
      .select(col("__id"), size(col("ts")).as("sz"),
        transform(col("ts"), _.getField("tok")).as("toks"))
      .localCheckpoint() // reused by the candidate AND verify stages
    val prefLen = (col("sz") -
      ceil(col("sz") * lit(thresholdNum) / lit(thresholdDen)) + 1).cast("int")
    val pref = docSets.select(col("__id"),
      explode(slice(col("toks"), lit(1), prefLen)).as("tok"))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.tok") === col("b.tok") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b")).distinct()
    cand
      .join(docSets.select(col("__id").as("id_a"), col("toks").as("toks_a"),
        col("sz").as("sz_a")), Seq("id_a"))
      .join(docSets.select(col("__id").as("id_b"), col("toks").as("toks_b"),
        col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * thresholdDen >= col("uni") * thresholdNum)
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / col("uni").cast("double")).as("jac"))
  }

  /** Cross-document duplicated-span detection — the exact-substring dedup
    * shape ("Deduplicating Training Data Makes Language Models Better",
    * Lee et al. 2022, done at word-k-gram granularity instead of a
    * corpus-wide suffix array, which does not distribute): a k-gram
    * occurrence is DUPLICATED when the same k tokens appear ≥
    * `minOccurrences` times anywhere in the corpus (other documents or
    * elsewhere in the same one); overlapping/adjacent duplicated windows
    * merge into maximal spans. Emits one row per maximal span —
    * (idCol, span_start, span_end, span_tokens), token positions 0-based
    * inclusive — the mask a rewrite/excision pass consumes.
    *
    * Plan: ONE tokenize pass (`posexplode` of the k-shingle list);
    * duplicated-ness is a count over the gram partition of that same
    * pass — no self-join (a stop-gram costs linear count work here, not
    * the df² pair fan-out of a postings join), no second corpus scan.
    * Exchanges carry (doc, pos, gram) rows — gram-shaped, k tokens wide;
    * document bodies never shuffle. The span merge is a per-document
    * lag/running-sum window over FLAGGED positions only — bounded by
    * tokens-per-document. Since every window has the same length k, ends
    * are ordered with starts and the merge condition is just
    * `pos > prev + k` (gaps-and-islands with a lag, no running-max).
    *
    * `portable = false` swaps the gram string for its xxhash64 before the
    * exchange — constant-width keys for a 100 TB run (a 2⁻⁶⁴/pair
    * collision can only over-flag); the md5-free string form is what a
    * DuckDB oracle can re-derive, so only `portable = true` is
    * oracle-mirrored (the capPerGroupAgg rule). All outputs are integers
    * — exact on any engine, any partitioning. */
  def duplicateSpans(docs: DataFrame, k: Int = 6, minOccurrences: Int = 2,
                     idCol: String = "doc_id", textCol: String = "text",
                     portable: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"span gram width must be >= 2: $k")
    require(minOccurrences >= 2, s"minOccurrences must be >= 2: $minOccurrences")
    val g = docs
      .select(col(idCol), posexplode(Text.shingles(col(textCol), k)).as(Seq("__pos", "__g0")))
      .select(col(idCol), col("__pos"),
        (if (portable) col("__g0") else xxhash64(col("__g0")).cast("string")).as("__g"))
    val flagged = g
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy("__g")))
      .filter(col("__cnt") >= minOccurrences)
      .select(col(idCol), col("__pos"))
    val wd = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    flagged
      .withColumn("__prev", lag(col("__pos"), 1).over(wd))
      .withColumn("__new",
        when(col("__prev").isNull || col("__pos") > col("__prev") + k, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(wd))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("__pos")).cast("long").as("span_start"),
        (max(col("__pos")) + (k - 1)).cast("long").as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** KEEP-FIRST variant of [[duplicateSpans]] — the Lee et al. 2022
    * keep-one-occurrence policy at the same k-gram granularity: for each
    * duplicated gram, its CANONICAL occurrence — the globally smallest
    * (idCol, position) among all occurrences, a deterministic pick that
    * no partitioning or retry can change — is left unflagged, and only
    * the other occurrences merge into excision spans. Feeding the mask
    * to [[exciseSpans]] then keeps duplicated content exactly once
    * corpus-wide instead of removing it everywhere (the SlimPajama
    * policy [[duplicateSpans]] serves).
    *
    * Same single-pass plan as [[duplicateSpans]] plus one more window
    * over the same gram exchange (`min(struct(doc, pos))` — the
    * canonical pick); the same k-gram hot-mass bound applies (at k ≥ 6
    * the hottest gram's window group is orders below a stop-token's —
    * the bound documented on [[duplicateSpans]]). Because flags are
    * per-OCCURRENCE, a document may keep gram g's canonical occurrence
    * while a neighboring duplicated gram is excised — span boundaries
    * are occurrence-exact, not class-exact (the same granularity trade
    * the detection side already makes vs a suffix array). */
  def duplicateSpansKeepFirst(docs: DataFrame, k: Int = 6, minOccurrences: Int = 2,
                              idCol: String = "doc_id", textCol: String = "text",
                              portable: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"span gram width must be >= 2: $k")
    require(minOccurrences >= 2, s"minOccurrences must be >= 2: $minOccurrences")
    val g = docs
      .select(col(idCol), posexplode(Text.shingles(col(textCol), k)).as(Seq("__pos", "__g0")))
      .select(col(idCol), col("__pos"),
        (if (portable) col("__g0") else xxhash64(col("__g0")).cast("string")).as("__g"))
    val wg = Window.partitionBy("__g")
    val flagged = g
      .withColumn("__cnt", count(lit(1)).over(wg))
      .withColumn("__mn", min(struct(col(idCol).as("d"), col("__pos").as("p"))).over(wg))
      .filter(col("__cnt") >= minOccurrences &&
        !(col("__mn.d") === col(idCol) && col("__mn.p") === col("__pos")))
      .select(col(idCol), col("__pos"))
    val wd = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    flagged
      .withColumn("__prev", lag(col("__pos"), 1).over(wd))
      .withColumn("__new",
        when(col("__prev").isNull || col("__pos") > col("__prev") + k, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(wd))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("__pos")).cast("long").as("span_start"),
        (max(col("__pos")) + (k - 1)).cast("long").as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Apply a [[duplicateSpans]] mask: excise every duplicated span of at
    * least `minSpanTokens` tokens from every document, rebuilding the
    * text from the surviving tokens (the remove-everywhere policy —
    * SlimPajama-style; [[duplicateSpansKeepFirst]] produces the mask for
    * the Lee-et-al keep-one-occurrence policy).
    * Returns every input document: (idCol, kept_text, n_tok, n_removed)
    * — unspanned documents pass through with their token stream intact.
    *
    * Plan: spans collapse to one doc-width row of (start, end) structs
    * (spans per document are few — they are MERGED maximal intervals),
    * joined back on the document key; the rebuild is row-local
    * higher-order-function work (index-aware `transform` + `filter`,
    * O(tokens · spans) per row) inside codegen — no exchange beyond the
    * doc-keyed span join, document text never shuffles. */
  def exciseSpans(docs: DataFrame, spans: DataFrame, minSpanTokens: Long = 0L,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sp = spans.filter(col("span_tokens") >= minSpanTokens)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__sp"))
    val toks = Text.tokens(col(textCol))
    val spOrEmpty = coalesce(col("__sp"),
      array().cast("array<struct<span_start:bigint,span_end:bigint>>"))
    val indexed = transform(toks, (t, i) => struct(t.as("t"), i.cast("long").as("i")))
    val kept = filter(indexed, p =>
      !exists(spOrEmpty, s =>
        p("i") >= s("span_start") && p("i") <= s("span_end")))
    docs.join(sp, Seq(idCol), "left")
      .select(col(idCol),
        array_join(transform(kept, p => p("t")), " ").as("kept_text"),
        size(toks).cast("long").as("n_tok"),
        (size(toks) - size(kept)).cast("long").as("n_removed"))
  }

  /** Winnowing fingerprints — the MOSS algorithm (Schleimer, Wilkerson &
    * Aiken 2003): hash every k-gram, slide a window of `window`
    * consecutive gram hashes, select each window's MINIMUM (ties to the
    * RIGHTMOST — the original paper's rule), and emit the distinct
    * selected (position, hash) pairs. Guarantees every shared substring
    * of ≥ window+k−1 tokens yields at least one matching fingerprint,
    * with ~2/(window+1) selection density — the positional, size-bounded
    * alternative to full k-gram sets for overlap detection.
    *
    * Determinism trick shared with the oracle: the comparison key packs
    * (40-bit gram hash, bit-inverted position) into one long
    * (`h40·2²⁰ + (2²⁰−1−pos)`), so a single windowed MIN realizes
    * min-by-hash-then-rightmost exactly — no argmin window, identical in
    * any engine. Positions are taken mod 2²⁰ (1M grams/document); a
    * 40-bit hash collision inside one window can only swap which equal
    * copy is selected — both sides of an oracle agree regardless.
    *
    * Plan: one positional shingle pass; the selection is a per-document
    * ROWS window (bounded by grams/doc); exchanges carry (doc, pos, key)
    * longs — text never shuffles. Documents shorter than one window
    * yield the single clipped window at position 0. */
  def winnowFingerprints(docs: DataFrame, k: Int = 4, window: Int = 5,
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && window >= 1)
    val two40 = 1099511627776L
    val two20 = 1048576L
    val g = docs
      .select(col(idCol), posexplode(Text.shingles(col(textCol), k)).as(Seq("__pos", "__g")))
    val h40 = pmod(Seeds.portableHash64(col("__g")), lit(two40))
    val key = h40 * two20 + (lit(two20 - 1) - pmod(col("__pos").cast("long"), lit(two20)))
    val wd = Window.partitionBy(col(idCol))
    val win = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(Window.currentRow, window - 1)
    g.select(col(idCol), col("__pos"), key.as("__k"))
      .withColumn("__n", count(lit(1)).over(wd))
      .withColumn("__sel", min(col("__k")).over(win))
      .filter(col("__pos") <= greatest(col("__n") - window, lit(0L)))
      .select(col(idCol),
        (lit(two20 - 1) - col("__sel").bitwiseAND(lit(two20 - 1))).as("fp_pos"),
        shiftright(col("__sel"), 20).as("fp_hash"))
      .distinct()
  }

  /** Blocked containment pairs — the asymmetric cousin of Jaccard:
    * `|A∩B| / |A|` flags documents whose shingle set is (mostly) contained
    * in another's, which Jaccard misses whenever the containing document
    * is much longer (excerpts, quotations, boilerplate-wrapped copies —
    * the dedup mode a Jaccard threshold cannot express). Emits ordered
    * (id_a < id_b) pairs with both directions' containment; a pair
    * qualifies when EITHER direction clears the threshold. Same
    * block-join scale contract as `blockedJaccardPairs`. */
  def blockedContainmentPairs(docs: DataFrame, blockCols: Seq[String],
                              id: String = "doc_id", text: String = "text",
                              shingleN: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(
      (blockCols.map(col) :+ col(id).as("__id") :+
        array_distinct(Text.shingles(col(text), shingleN)).as("__sh")): _*)
      .filter(size(col("__sh")) > 0)
    val a = sh.select(blockCols.map(c => col(c).as(s"${c}_a")) :+ col("__id").as("id_a") :+ col("__sh").as("sh_a"): _*)
    val b = sh.select(blockCols.map(c => col(c).as(s"${c}_b")) :+ col("__id").as("id_b") :+ col("__sh").as("sh_b"): _*)
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    a.join(b, blockCols.map(c => col(s"${c}_a") === col(s"${c}_b")).reduce(_ && _) && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (inter / size(col("sh_a"))).as("cont_a_in_b"),
        (inter / size(col("sh_b"))).as("cont_b_in_a"))
      .filter(col("cont_a_in_b") >= threshold || col("cont_b_in_a") >= threshold)
  }
}
