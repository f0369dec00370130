package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the degenerate-vector contract of the top-k searches: zero-norm or
  * length-mismatched pairs score NaN/null and are EXCLUDED from the
  * ranking (the bounded-buffer TopK aggregate drops them), unlike a
  * `row_number` window over `cos DESC` which would rank NaN first. The
  * divergence is intentional — see the Similarity scaladocs. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Seq(1.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f)),
    (3L, Seq(0.0f, 0.0f)),      // zero-norm: cos is NaN against anything
    (4L, Seq(1.0f, 0.0f, 0.5f)) // length mismatch vs 2-dim queries: null dot
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK drops NaN/null-scoring pairs instead of ranking them first") {
    val queries = Seq((100L, Seq(1.0f, 0.0f))).toDF("qid", "qvec")
    val out = Similarity.bruteForceTopK(corpus, queries, k = 4)
      .orderBy("rnk").collect()
    // only the two well-formed vectors rank; ids 3 (zero-norm) and 4
    // (length mismatch) are absent, so fewer than k rows come back
    assert(out.map(_.getAs[Long]("neighbor")).toSeq === Seq(1L, 2L))
    assert(out.forall(r => !r.getAs[Double]("cos").isNaN))
  }

  test("a zero-norm query yields zero rows (every pair is NaN)") {
    val queries = Seq((100L, Seq(0.0f, 0.0f))).toDF("qid", "qvec")
    assert(Similarity.bruteForceTopK(corpus, queries, k = 3).isEmpty)
  }

  test("cellTopK obeys the same degenerate-pair exclusion") {
    val cCorpus = corpus.withColumn("cell", lit(0))
    val queries = Seq((100L, Seq(1.0f, 0.0f))).toDF("qid", "qvec")
      .withColumn("qcell", lit(0))
    val out = Similarity.cellTopK(cCorpus, queries, k = 4, cell = "cell", qcell = "qcell")
      .orderBy("rnk").collect()
    assert(out.map(_.getAs[Long]("neighbor")).toSeq === Seq(1L, 2L))
  }

  test("cellTopK/multiProbeTopK scanParallelism: values identical, corpus repartitioned before the probe") {
    // the r8/r9 parallelism-inheritance trap, third sighting (r9 sf10
    // communities run): a broadcast-probe stage inherits the SCAN's
    // split count while doing |cell|·|queries| work — the guard must
    // re-spread the corpus WITHOUT changing any result
    val cCorpus = corpus.withColumn("cell", lit(0))
    val queries = Seq((100L, Seq(1.0f, 0.0f)), (101L, Seq(0.5f, 0.5f)))
      .toDF("qid", "qvec").withColumn("qcell", lit(0))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor"), r.getAs[Double]("cos"))).toSet
    val plain = Similarity.cellTopK(cCorpus, queries, k = 4, cell = "cell", qcell = "qcell")
    val spread = Similarity.cellTopK(cCorpus, queries, k = 4, cell = "cell", qcell = "qcell",
      scanParallelism = 5)
    assert(rows(spread) === rows(plain))
    assert(spread.queryExecution.executedPlan.toString.contains("RoundRobinPartitioning(5"),
      "scanParallelism must insert the corpus repartition")
    val probed = queries.withColumn("probes", array(lit(0)))
    val mp = Similarity.multiProbeTopK(cCorpus, probed, k = 4, cell = "cell")
    val mpS = Similarity.multiProbeTopK(cCorpus, probed, k = 4, cell = "cell",
      scanParallelism = 5)
    assert(rows(mpS) === rows(mp))
  }

  test("sparseCosinePairs: identical docs hit 1.0, hand-computed pair, disjoint absent") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), // identical → cos 1.0
      (3L, "alpha alpha"), // vs doc1: dot=2, |(2)|=2, |(1,1)|=√2 → 2/(2√2)=1/√2
      (4L, "zeta")) // shares nothing
      .toDF("doc_id", "text")
    val out = Similarity.sparseCosinePairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // identical docs: 2/(√2·√2) — deterministic IEEE, a hair under 1.0
    assert(out((1L, 2L)) === 2.0 / (math.sqrt(2.0) * math.sqrt(2.0)))
    assert(out((1L, 3L)) === 2.0 / (2.0 * math.sqrt(2.0)))
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("sparseCosinePairs maxDf guard: cap above max df ≡ unguarded; small cap drops stop-word pairs, keeps rare-term pairs, never inflates") {
    val s = spark
    import s.implicits._
    // "the" is a stop word (df=4); "quark"/"gluon" are discriminative
    val docs = Seq(
      (1L, "the the quark gluon"), (2L, "the quark gluon"),
      (3L, "the lepton"), (4L, "the boson"))
      .toDF("doc_id", "text")
    def pairs(maxDf: Int) =
      Similarity.sparseCosinePairs(docs, threshold = 0.1, maxDf = maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = pairs(0)
    // a cap no term exceeds is bit-identical to the unguarded form
    assert(pairs(10) === exact)
    val guarded = pairs(3) // drops "the" (df=4), keeps everything else
    // guarded output ⊆ unguarded, and every surviving cosine is a lower bound
    assert(guarded.keySet.subsetOf(exact.keySet))
    guarded.foreach { case (k, v) => assert(v <= exact(k) + 1e-15) }
    // pairs that ride only on the stop word vanish; rare-term pairs survive
    assert(!guarded.contains((3L, 4L)) && exact.contains((3L, 4L)))
    assert(guarded.contains((1L, 2L)))
    // norms still use the FULL vector: doc1=(2,1,1,…) doc2=(1,1,1) share
    // quark+gluon after the cap → dot=2, cos = 2/(√6·√3)
    assert(guarded((1L, 2L)) === 2.0 / (math.sqrt(6.0) * math.sqrt(3.0)))
  }

  test("bucketed nearDupPairs ≡ plain within-cell self-join (exact pair set, any B)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    // 3 cells of uneven size incl. a singleton; vectors clustered so a
    // nontrivial subset of pairs crosses the 0.8 threshold
    val emb = (1L to 60L).map { i =>
      val c = if (i <= 40) "a" else if (i <= 59) "b" else "c"
      val base = if (i % 3 == 0) Seq(1.0f, 0.1f, 0f) else Seq(0.1f, 1.0f, 0.3f)
      (i, base.map(v => v + rnd.nextFloat() * 0.2f), c)
    }.toDF("vec_id", "embedding", "cell")
    def pairs(b: Int, p: Int) =
      Similarity.nearDupPairs(emb, threshold = 0.8, cell = "cell",
          buckets = b, pairParallelism = p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = pairs(1, 0)
    assert(plain.nonEmpty && plain.exists(p => p._3 < 0.999), "fixture too degenerate")
    // every bucket count and the explicit-parallelism pin give the SAME set
    for (b <- Seq(2, 3, 8, 64); p <- Seq(0, 16))
      assert(pairs(b, p) === plain, s"buckets=$b parallelism=$p diverged")
    // ids stay canonically ordered in the bucketed path too
    assert(pairs(8, 16).forall(p => p._1 < p._2))
    // semanticDedup keep-set is bucketing-invariant as well
    val kept1 = Similarity.semanticDedup(emb, 0.8, "cell")
      .select("vec_id").as[Long].collect().toSet
    val kept8 = Similarity.semanticDedup(emb, 0.8, "cell", buckets = 8, pairParallelism = 16)
      .select("vec_id").as[Long].collect().toSet
    assert(kept8 === kept1)
  }

  test("semanticDedup keeps the min-id representative per cluster, leaves singletons") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), "a"), (2L, Seq(1.0f, 0.01f), "a"), // near-dups → keep 1
      (3L, Seq(0.0f, 1.0f), "a"), // orthogonal singleton
      (4L, Seq(1.0f, 1.0f), "b"), (5L, Seq(2.0f, 2.0f), "b"), // colinear → keep 4
      (6L, Seq(-1.0f, 1.0f), "b"))
      .toDF("vec_id", "embedding", "cell")
    val kept = Similarity.semanticDedup(emb, threshold = 0.9, cell = "cell")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 3L, 4L, 6L))
    // cross-cell near-dups are invisible by construction (blocking contract)
    val crossCell = emb.withColumn("cell",
      when(col("vec_id") === 2L, lit("z")).otherwise(col("cell")))
    val kept2 = Similarity.semanticDedup(crossCell, threshold = 0.9, cell = "cell")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept2 === Seq(1L, 2L, 3L, 4L, 6L))
  }

  test("mutualKnnEdges keeps exactly the pairs where both endpoints rank each other") {
    val top = Seq(
      (1L, 2L), (2L, 1L),  // mutual → edge (1,2)
      (1L, 3L),            // one-way only
      (3L, 4L), (4L, 3L),  // mutual → edge (3,4)
      (4L, 1L)             // one-way only
    ).toDF("qid", "neighbor")
    val got = Similarity.mutualKnnEdges(top)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (3L, 4L)))
  }

  test("prototypicalityPrune keeps the least prototypical fraction per cell") {
    // cell 0: three near-identical vectors and one orthogonal outlier —
    // the outlier is the hard example and must rank first at keepFrac=0.5
    val emb = Seq(
      (1L, Seq(1.0f, 0.01f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(1.0f, -0.01f), 0), (4L, Seq(0.0f, 1.0f), 0),
      (5L, Seq(0.5f, 0.5f), 1), (6L, Seq(0.5f, 0.52f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.prototypicalityPrune(emb, keepFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // ceil(0.5·4)=2 from cell 0 (outlier 4 first), ceil(0.5·2)=1 from cell 1
    assert(out.map(t => (t._1, t._2)).contains((4L, 0)))
    assert(out.count(_._2 == 0) === 2 && out.count(_._2 == 1) === 1)
    assert(out.filter(_._2 == 0).map(_._3).toSeq.sorted === Seq(1L, 2L))
    // hardest=false inverts: the outlier is pruned, prototypes kept
    val easy = Similarity.prototypicalityPrune(emb, keepFrac = 0.5, hardest = false)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(!easy.contains((4L, 0L.toInt)) && easy.count(_._2 == 0) === 2)
    // keepFrac=1 keeps everything, ranks are a permutation of 1..n
    val all = Similarity.prototypicalityPrune(emb, keepFrac = 1.0)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(all.count(_._1 == 0) === 4 && all.filter(_._1 == 0).map(_._2).sorted.toSeq === (1L to 4L))
    // repartition-stable
    val out2 = Similarity.prototypicalityPrune(emb.repartition(5), keepFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out2 === out)
  }

  test("prototypicalityPrune broadcasts the centroid side; the prefix join never sort-merges") {
    val emb = (1L to 40L).map(i =>
      (i, Seq((i % 7).toFloat, (i % 3).toFloat), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
    val df = Similarity.prototypicalityPrune(emb, keepFrac = 0.5)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), s"centroid join is not a broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"vectors shuffled for the centroid join:\n$p")
  }

  // --- margin-based bitext mining ---

  test("marginMining equals the window-formulated reference, bit-for-bit, any partitioning") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextFloat())))
    val emb = vecs.toDF("vec_id", "embedding")
    val src = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val tgt = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val k = 3; val tau = 1.0

    // reference: all-pairs scores + row_number windows + the same avg law
    val scored = src.select(col("vec_id").as("sid"), col("embedding").as("sv"))
      .crossJoin(tgt.select(col("vec_id").as("tid"), col("embedding").as("tv")))
      .withColumn("c", Similarity.cosine(col("sv"), col("tv")))
      .select("sid", "tid", "c")
    val fwd = scored.withColumn("rnk",
      row_number().over(Window.partitionBy("sid").orderBy(col("c").desc, col("tid"))))
      .filter(col("rnk") <= k)
    val bwd = scored.withColumn("rnk",
      row_number().over(Window.partitionBy("tid").orderBy(col("c").desc, col("sid"))))
      .filter(col("rnk") <= k)
    def avgOf(df: org.apache.spark.sql.DataFrame, key: String, out: String) =
      df.groupBy(key).agg(
        (sum(round(col("c"), 9).cast(DecimalType(18, 9))).cast("double")
          / count(lit(1))).as(out))
    val ref = fwd
      .join(avgOf(fwd, "sid", "aS"), "sid")
      .join(avgOf(bwd, "tid", "aT"), "tid")
      .withColumn("mg", col("c") / ((col("aS") + col("aT")) / 2))
      .withColumn("r", row_number().over(
        Window.partitionBy("sid").orderBy(col("mg").desc, col("tid"))))
      .filter(col("r") === 1 && col("mg") > tau)
      .select(col("sid"), col("tid"), col("mg"))
      .as[(Long, Long, Double)].collect().toSet
    assert(ref.nonEmpty, "fixture sanity: some pair must clear the threshold")

    for (parts <- Seq(1, 13)) {
      val got = Similarity.marginMining(
          src.repartition(parts), tgt.repartition(parts), k, tau)
        .as[(Long, Long, Double)].collect().toSet
      assert(got === ref, s"parts=$parts")
    }
  }

  test("marginMining: zero-norm vectors never surface; no WindowExec in the plan") {
    val src = Seq((0L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val tgt = Seq((1L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val df = Similarity.marginMining(src, tgt, k = 2, threshold = 0.0)
    val out = df.as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSet === Set(0L)) // the zero-norm source mines nothing
    assert(out.head._2 === 1L)              // and nothing mines the zero-norm target
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("Window"), s"margin argmax must be the bounded-TopK aggregate:\n$p")
  }

  test("prototypicalityPrune: bucketed two-level rank ≡ the per-cell row_number window, both directions") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    // 4 cells, 400 vectors, deliberate DUPLICATE vectors (equal cosine →
    // id tie-breaks) and values straddling bucket boundaries
    val rows = Seq.tabulate(400) { i =>
      val base = rnd.nextInt(25)
      (i.toLong, Seq((base / 10.0f), (1.0f - base / 25.0f)), i % 4)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
      .repartition(7)
    for (hardest <- Seq(true, false); keepFrac <- Seq(0.5, 1.0)) {
      val got = Similarity.prototypicalityPrune(emb, keepFrac, hardest)
        .as[(Long, Int, Long, Double)].collect().toSet
      // reference: the exact per-cell window form the rewrite replaced
      val cents = emb.groupBy(col("label"))
        .agg(graft.functions.GridVectorMean.gridMeanVec(col("embedding")).as("__c"),
          count(lit(1)).as("__n"))
      val ord = if (hardest) col("__cos").asc else col("__cos").desc
      val want = emb.join(broadcast(cents), "label")
        .withColumn("__cos", Similarity.cosine(col("embedding"), col("__c")))
        .withColumn("keep_rank", row_number().over(
          Window.partitionBy(col("label")).orderBy(ord, col("vec_id"))).cast("long"))
        .filter(col("keep_rank") <= ceil(lit(keepFrac) * col("__n")))
        .select(col("vec_id"), col("label"), col("keep_rank"),
          round(col("__cos"), 6).as("cos6"))
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(got === want, s"hardest=$hardest keepFrac=$keepFrac")
      assert(got.nonEmpty)
    }
  }
}
