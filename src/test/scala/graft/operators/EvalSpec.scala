package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {

  test("aucByGroup: perfect, inverted, and random scorers") {
    val s = spark
    import s.implicits._
    // group a: score perfectly separates (pos always higher) → AUC 1
    // group b: inverted → AUC 0
    // group c: constant score → all ranks tie → AUC 0.5
    val df = Seq(
      ("a", 0.9, 1), ("a", 0.8, 1), ("a", 0.2, 0), ("a", 0.1, 0),
      ("b", 0.9, 0), ("b", 0.8, 0), ("b", 0.2, 1), ("b", 0.1, 1),
      ("c", 0.5, 1), ("c", 0.5, 0), ("c", 0.5, 1), ("c", 0.5, 0)
    ).toDF("g", "score", "pos")
    val out = Eval.aucByGroup(df, "g", "score", "pos")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Double]("auc"))).toSeq
    assert(out == Seq(("a", 1.0), ("b", 0.0), ("c", 0.5)))
  }

  test("aucByGroup matches the pair-counting definition with ties") {
    val s = spark
    import s.implicits._
    val scores = Seq(0.1, 0.4, 0.4, 0.4, 0.7, 0.9, 0.9, 0.3)
    val labels = Seq(0, 0, 1, 0, 1, 1, 0, 1)
    val df = scores.zip(labels).map { case (x, y) => ("g", x, y) }
      .toDF("g", "score", "pos")
    // brute force: P(score_pos > score_neg) + 0.5 P(tie)
    val pos = scores.zip(labels).filter(_._2 == 1).map(_._1)
    val neg = scores.zip(labels).filter(_._2 == 0).map(_._1)
    val expect = (for { p <- pos; n <- neg } yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
    val auc = Eval.aucByGroup(df, "g", "score", "pos")
      .collect().head.getAs[Double]("auc")
    assert(math.abs(auc - expect) < 1e-12)
  }

  test("aucByGroup is invariant under monotone score transforms (rank statistic)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1 to 300).map(_ => (rnd.nextInt(50) / 10.0, rnd.nextInt(2)))
    val base = rows.map { case (x, y) => ("g", x, y) }.toDF("g", "score", "pos")
    val warped = rows.map { case (x, y) => ("g", math.exp(x) + 7.0, y) }
      .toDF("g", "score", "pos")
    def auc(df: org.apache.spark.sql.DataFrame) =
      Eval.aucByGroup(df, "g", "score", "pos").collect().head.getAs[Double]("auc")
    assert(auc(base) == auc(warped)) // exact: only ranks enter
  }

  test("skyline2D matches the quadratic dominance definition") {
    val s = spark
    import s.implicits._
    val pts = Seq(
      (1.0, 5), (1.0, 5), // duplicate point: survives with n_points=2
      (1.0, 3),           // dominated by (1.0, 5) (equal cost, more gain)
      (2.0, 7), (3.0, 7), // (3.0,7) dominated by (2.0,7)
      (4.0, 9), (5.0, 1))
    val df = pts.toDF("cost", "gain")
    val out = Eval.skyline2D(df, "cost", "gain")
      .orderBy("cost")
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getLong(2))).toSeq
    assert(out == Seq((1.0, 5, 2L), (2.0, 7, 1L), (4.0, 9, 1L)))
    // cross-check against the O(n²) definition on distinct points
    val distinct = pts.distinct
    val brute = distinct.filter { case (c, g) =>
      !distinct.exists { case (c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g) }
    }.sorted
    assert(out.map(t => (t._1, t._2)).sorted == brute)
  }

  test("skyline2D: randomized cross-check, bucketed ≡ brute force") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(400)((rnd.nextInt(40).toDouble, rnd.nextInt(40)))
    val out = Eval.skyline2D(pts.toDF("cost", "gain"), "cost", "gain",
        buckets = 7)
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toSeq.sorted
    val distinct = pts.distinct
    val brute = distinct.filter { case (c, g) =>
      !distinct.exists { case (c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g) }
    }.sorted
    assert(out == brute)
  }

  test("madOutliers: hand-computed median/MAD and outlier count") {
    val s = spark
    import s.implicits._
    // group g: values 1,2,3,4,100 → med 3, adev 2,1,0,1,97 → MAD 1,
    // outliers (>3·1): adev 97 → 1
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L), ("g", 100L))
      .toDF("src", "x")
    val r = Eval.madOutliers(df, "src", "x").collect().head
    assert(r.getAs[Double]("med") == 3.0)
    assert(r.getAs[Double]("mad") == 1.0)
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("equiDepthBins: bins are equal-depth and ordered") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i.toDouble, i.toLong)).toDF("v", "id")
    val out = Eval.equiDepthBins(df, 4, col("v"),
        col("v").cast("decimal(18,4)"), col("id"))
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(25L, 25L, 25L, 25L))
    assert(out.map(_.getAs[Double]("lo")).toSeq == Seq(1.0, 26.0, 51.0, 76.0))
    assert(out.map(_.getAs[Double]("hi")).toSeq == Seq(25.0, 50.0, 75.0, 100.0))
  }

  test("equiDepthBinsApprox: populations within rank-error bounds of exact, ties share a bin") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val n = 4000
    val df = (1 to n).map(i => (rnd.nextInt(500).toDouble, i.toLong)).toDF("v", "id")
    val bins = 8
    val accuracy = 10000
    val out = Eval.equiDepthBinsApprox(df, bins, col("v"),
        col("v").cast("decimal(18,4)"), accuracy).orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("n")).sum === n.toLong) // partition: no row lost
    // each boundary's rank error ≤ n/accuracy → bin depth off by ≤ 2n/accuracy
    val tol = 2.0 * n / accuracy + 1
    // ...plus tie mass: equal values never split, so a bin can absorb up
    // to one full tie group beyond the rank bound (~n/500 expected here)
    val tieSlack = out.map(r => math.max(0L,
      df.filter(col("v") === r.getAs[Double]("hi")).count() - 1)).max
    out.foreach { r =>
      val dev = math.abs(r.getAs[Long]("n") - n.toDouble / bins)
      assert(dev <= tol + tieSlack, s"bin ${r.getAs[Int]("bin")} depth off by $dev")
    }
    // bins tile the value range in order: next lo strictly above prev hi's bin start
    val los = out.map(_.getAs[Double]("lo"))
    val his = out.map(_.getAs[Double]("hi"))
    assert(los.zip(his).forall { case (l, h) => l <= h })
    assert(his.init.zip(los.tail).forall { case (h, l) => h <= l })
    // same-schema contract with the exact form
    val exact = Eval.equiDepthBins(df, bins, col("v"),
      col("v").cast("decimal(18,4)"), col("id"))
    assert(exact.schema.map(f => (f.name, f.dataType)) ===
      out.headOption.map(_ => Eval.equiDepthBinsApprox(df, bins, col("v"),
        col("v").cast("decimal(18,4)"), accuracy))
        .get.schema.map(f => (f.name, f.dataType)))
  }

  test("winsorize clips outliers to the percentile bounds, keeps interior rows") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // values 1..100: P10=10.9, P90=90.1 (linear interpolation)
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = Eval.winsorize(df, "g", col("v"), 0.1, 0.9)
      .select("v", "clipped", "was_clipped")
      .as[(Double, Double, Boolean)].collect()
    assert(out.count(_._3) === 20) // 1..10 and 91..100 clip
    assert(out.filter(_._1 == 5.0).head._2 === 10.9)
    assert(out.filter(_._1 == 95.0).head._2 === 90.1)
    assert(out.filter(_._1 == 50.0).head._2 === 50.0) // interior untouched
  }

  test("liftTable: a perfect scorer captures everything in the first buckets") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // scores == labels: 4 positives rank first; 2 buckets of 4
    val df = (1 to 8).map(i => (i.toLong, if (i <= 4) 1 else 0, 9.0 - i))
      .toDF("id", "y", "score")
    val out = Eval.liftTable(df, col("score"), col("y") === 1, col("id"), buckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    // bucket 1: all 4 positives → capture 1.0 at depth 0.5 → lift 2.0
    assert(out.toSeq === Seq((4L, 4L, 1.0, 0.5, 2.0), (0L, 4L, 1.0, 1.0, 1.0)))
  }

  test("liftTable depth uses actual cumulative rows when ntile is uneven") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // 5 rows, 2 buckets → ntile front-loads 3 rows into bucket 1; a
    // skill-less scorer (all positive) must report lift exactly 1.0
    val df = (1 to 5).map(i => (i.toLong, 1, 10.0 - i)).toDF("id", "y", "score")
    val out = Eval.liftTable(df, col("score"), col("y") === 1, col("id"), buckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq === Seq((3L, 0.6, 1.0), (2L, 1.0, 1.0)))
  }

  test("liftTableApprox: bucket depths within rank-error of exact NTILE form, same schema") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val n = 4000
    // near-unique scores (doubles off a 10^6 grid) + a score-correlated label
    val df = (1 to n).map { i =>
      val sc = rnd.nextInt(1000000) / 1000.0
      (i.toLong, if (sc + rnd.nextInt(400) > 700) 1 else 0, sc)
    }.toDF("id", "y", "score")
    val buckets = 8
    val accuracy = 10000
    val approx = Eval.liftTableApprox(df, col("score"), col("y") === 1,
      buckets, accuracy).orderBy("bucket").collect()
    val exact = Eval.liftTable(df, col("score"), col("y") === 1, col("id"),
      buckets).orderBy("bucket").collect()
    // partition: nothing lost, totals identical to the exact form
    assert(approx.map(_.getAs[Long]("n")).sum === n.toLong)
    assert(approx.map(_.getAs[Long]("n_pos")).sum ===
      exact.map(_.getAs[Long]("n_pos")).sum)
    // per-bucket depth within two boundary rank errors of n/buckets
    val tol = 2.0 * n / accuracy + 1
    approx.foreach { r =>
      val dev = math.abs(r.getAs[Long]("n") - n.toDouble / buckets)
      assert(dev <= tol, s"bucket ${r.getAs[Int]("bucket")} depth off by $dev")
    }
    // bucket 1 = top scores: capture increases with depth, ends at 1.0
    val caps = approx.map(_.getAs[Double]("capture"))
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b })
    assert(math.abs(caps.last - 1.0) < 1e-12)
    // a score-correlated model front-loads lift: bucket 1 beats the tail
    assert(approx.head.getAs[Double]("lift") > approx.last.getAs[Double]("lift"))
    // same output schema as the exact form
    val exactSchema = Eval.liftTable(df, col("score"), col("y") === 1,
      col("id"), buckets).schema.map(f => (f.name, f.dataType))
    val approxSchema = Eval.liftTableApprox(df, col("score"), col("y") === 1,
      buckets, accuracy).schema.map(f => (f.name, f.dataType))
    assert(exactSchema === approxSchema)
  }

  test("liftTableApprox plan: no single-partition row-level window (the exact form's global NTILE is gone)") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i.toLong, i % 2, i.toDouble)).toDF("id", "y", "score")
    val p = Eval.liftTableApprox(df, col("score"), col("y") === 1, 4)
      .queryExecution.executedPlan.toString
    // the ≤buckets-row cumulative windows survive; the corpus-sized NTILE
    // window (which plans as Window over SinglePartition BEFORE any
    // aggregate) must not: assignment is a broadcast of sketch boundaries
    // "ntile(" — the window function; plain "ntile" also matches
    // perce-NTILE-_approx, which must stay
    assert(!p.contains("ntile("), s"approx lift table still plans an NTILE:\n$p")
    assert(p.contains("percentile_approx"), s"expected the GK sketch in:\n$p")
  }

  test("weightedMedian: hand-checked with ties, dominant weight pulls the median") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // g1: values 1,2,3 weights 1,1,1 → cum 1,2,3; 2*cum>=3 first at v=2
    // g2: values 1,2,3 weights 1,1,10 → half=6, only v=3 reaches it
    // g3: ties: values 1,1,2 weights 1,1,1 → cum at v=1 is 2 (range frame), 2*2>=3 → 1
    val df = Seq(
      ("g1", 1, 1.0), ("g1", 2, 1.0), ("g1", 3, 1.0),
      ("g2", 1, 1.0), ("g2", 2, 1.0), ("g2", 3, 10.0),
      ("g3", 1, 1.0), ("g3", 1, 1.0), ("g3", 2, 1.0))
      .toDF("g", "v", "w")
    val out = Eval.weightedMedian(df, "g", col("v"), col("w"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out === Map("g1" -> 2, "g2" -> 3, "g3" -> 1))
    // repartition-stable
    val out2 = Eval.weightedMedian(df.repartition(5), "g", col("v"), col("w"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out2 === out)
  }

  test("knnLabelAccuracy: separable clusters score perfectly; vote ties go to the smallest label") {
    val s = spark
    import s.implicits._
    // two tight clusters on orthogonal axes; ids ≡ 0 mod 2 are queries
    val emb = Seq(
      (0L, Seq(1.0f, 0.00f), 0), (1L, Seq(1.0f, 0.01f), 0),
      (3L, Seq(1.0f, 0.02f), 0),
      (2L, Seq(0.0f, 1.00f), 1), (5L, Seq(0.01f, 1.0f), 1),
      (7L, Seq(0.02f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Eval.knnLabelAccuracy(emb, k = 2, sampleMod = 2)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // queries: 0 (label 0) and 2 (label 1); 2-NN stays inside each cluster
    assert(out === Map(0 -> ((1L, 1L)), 1 -> ((1L, 1L))))
    // tie case: k=2 forces one neighbor of each label for the lone query —
    // the vote breaks to the SMALLEST label
    val tie = Seq(
      (0L, Seq(1.0f, 1.0f), 9),            // query, true label 9
      (1L, Seq(1.0f, 0.99f), 4),           // one vote for 4
      (3L, Seq(0.99f, 1.0f), 2))           // one vote for 2
      .toDF("vec_id", "embedding", "label")
    val tieOut = Eval.knnLabelAccuracy(tie, k = 2, sampleMod = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(tieOut === Seq((9, 1L, 0L))) // predicted 2 (smallest), wrong
  }

  // --- ROUGE-N ---

  private def rougeRows(pairs: Seq[(Long, String, String)], n: Int) = {
    val s = spark
    import s.implicits._
    Eval.rougeN(pairs.toDF("pair_id", "cand", "ref"), "pair_id", "cand", "ref", n)
      .orderBy("pair_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double]),
        Option(r.get(6)).map(_.asInstanceOf[Double])))
      .toSeq
  }

  test("rougeN: identical, partial, and hand-computed clipped overlap") {
    val out = rougeRows(Seq(
      (1L, "the cat sat", "the cat sat"), // identical: P=R=F1=1
      (2L, "the cat sat", "the cat ran"), // share 1 of 2 bigrams each side
      (3L, "a b c", "x y z")), n = 2)     // disjoint
    assert(out(0) === ((1L, 2L, 2L, 2L, Some(1.0), Some(1.0), Some(1.0))))
    assert(out(1) === ((2L, 1L, 2L, 2L, Some(0.5), Some(0.5), Some(0.5))))
    assert(out(2) === ((3L, 0L, 2L, 2L, Some(0.0), Some(0.0), Some(0.0))))
  }

  test("rougeN: counts are CLIPPED — a repeated candidate gram scores min(c_cand, c_ref)") {
    // cand bigrams: "a b"×3, "b a"×2 (5 total); ref: "a b"×1
    // overlap = min(3,1) = 1 → recall 1.0 (ROUGE-N proper), precision 0.2
    val out = rougeRows(Seq((1L, "a b a b a b", "a b")), n = 2)
    assert(out.head === ((1L, 1L, 5L, 1L, Some(0.2), Some(1.0), Some(1.0 / 3))))
  }

  test("rougeN: pairs with no n-grams on either side survive with null scores") {
    val out = rougeRows(Seq(
      (1L, "", ""),              // no tokens at all
      (2L, "single", "single"),  // 1 token < bigram order
      (3L, "two words", "")),    // candidate grams only
      n = 2)
    assert(out(0) === ((1L, 0L, 0L, 0L, None, None, None)))
    assert(out(1) === ((2L, 0L, 0L, 0L, None, None, None)))
    assert(out(2) === ((3L, 0L, 1L, 0L, Some(0.0), None, Some(0.0))))
  }
}
