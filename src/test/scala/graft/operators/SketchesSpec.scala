package graft.operators

import graft.SparkSpec
import graft.functions.TopK
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("bottomKDistinct keeps each hash once (duplicates don't eat buffer slots)") {
    // 3 distinct values, each repeated 5 times; k=3 must capture all 3
    val df = (0 until 15).map(i => ("g", s"v${i % 3}")).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(Sketches.kmvSketch(col("v"), k = 3).as("kmv"))
      .select(size(col("kmv"))).as[Int].head()
    assert(out === 3)
  }

  test("kmvEstimate is exact below k and within tolerance above") {
    val df = (1 to 2000).map(i => (if (i <= 40) "small" else "big", s"val$i"))
      .toDF("g", "v")
    val est = df.groupBy("g")
      .agg(Sketches.kmvSketch(col("v"), k = 128).as("kmv"))
      .select(col("g"), Sketches.kmvEstimate(col("kmv"), k = 128).as("est"))
      .as[(String, Double)].collect().toMap
    assert(est("small") === 40.0) // below k: exact
    // 1960 distinct with k=128: relative error ~1/sqrt(k) ≈ 9%
    assert(math.abs(est("big") - 1960.0) / 1960.0 < 0.3)
  }

  test("kmvSketchFast (xxhash production path): same estimator contract, same merge law") {
    val df = (1 to 2000).map(i => (if (i <= 40) "small" else "big", s"val$i"))
      .toDF("g", "v")
    val est = df.groupBy("g")
      .agg(Sketches.kmvSketchFast(col("v"), k = 128).as("kmv"))
      .select(col("g"), Sketches.kmvEstimate(col("kmv"), k = 128).as("est"))
      .as[(String, Double)].collect().toMap
    assert(est("small") === 40.0)
    assert(math.abs(est("big") - 1960.0) / 1960.0 < 0.3)
    // merge of per-shard sketches == sketch of the whole (same k smallest)
    val k = 16
    val whole = df.agg(Sketches.kmvSketchFast(col("v"), k).as("kmv"))
      .select(col("kmv")).as[Seq[Long]].head()
    val merged = df.withColumn("shard", pmod(xxhash64(col("v"), lit(7)), lit(4)))
      .groupBy("shard").agg(Sketches.kmvSketchFast(col("v"), k).as("kmv"))
      .agg(collect_list(col("kmv")).as("all"))
      .select(aggregate(col("all"), typedLit(Seq.empty[Long]),
        (acc, x) => Sketches.kmvMerge(acc, x, k)).as("m"))
      .as[Seq[Long]].head()
    assert(merged === whole)
  }

  test("kmvMerge of group sketches equals the sketch of the union") {
    val k = 64
    val df = (1 to 1000).map(i => (s"g${i % 4}", s"item$i")).toDF("g", "v")
    val merged = df.groupBy("g")
      .agg(Sketches.kmvSketch(col("v"), k).as("kmv"))
      .agg(collect_list(col("kmv")).as("all"))
      .select(aggregate(col("all"),
        typedLit(Seq.empty[Long]),
        (acc, x) => Sketches.kmvMerge(acc, x, k)).as("m"))
      .as[Seq[Long]].head()
    val direct = df.groupBy(lit(1))
      .agg(Sketches.kmvSketch(col("v"), k).as("kmv"))
      .select(col("kmv")).as[Seq[Long]].head()
    assert(merged === direct)
  }

  test("repartition-stable: the sketch is identical under different partitionings") {
    val df = (1 to 500).map(i => ("g", s"x$i")).toDF("g", "v")
    def sketch(parts: Int) = df.repartition(parts).groupBy("g")
      .agg(Sketches.kmvSketch(col("v"), 32).as("kmv"))
      .select(col("kmv")).as[Seq[Long]].head()
    assert(sketch(1) === sketch(7))
  }

  test("cmsEstimate never underestimates and is exact for dominant keys") {
    val rows = (1 to 900).map(i => s"k${i % 3}") ++ Seq.fill(100)("heavy")
    val df = rows.toDF("v")
    val sketch = Sketches.cmsSketch(df, col("v"), d = 4, w = 64)
    val probes = Seq("k0", "k1", "k2", "heavy", "absent").toDF("probe")
    val est = Sketches.cmsEstimate(sketch, probes, d = 4, w = 64)
      .as[(String, Long)].collect().toMap
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq("k0", "k1", "k2", "heavy").foreach { p =>
      assert(est(p) >= truth(p), s"$p underestimated")
    }
    // w=64 with 4 distinct keys: collisions vanishingly unlikely → exact
    assert(est("heavy") === 100L)
    assert(est("absent") <= 300L) // bounded by collisions, never huge
  }

  test("bloom filter: no false negatives, bounded false positives, broadcast probe") {
    val keys = (1 to 50).map(i => s"key$i").toDF("v")
    val sketch = Sketches.bloomBuild(keys, col("v"), words = 8, k = 3)
    val probes = ((1 to 50).map(i => s"key$i") ++ (1 to 200).map(i => s"other$i"))
      .toDF("probe")
    val mc = Sketches.bloomMightContain(sketch, probes, words = 8, k = 3)
      .as[(String, Int)].collect().toMap
    (1 to 50).foreach(i => assert(mc(s"key$i") === 1, s"false negative key$i"))
    // 8*63=504 bits, 150 set at most → fp rate ~(0.26)^3 ≈ 2%
    val fps = (1 to 200).count(i => mc(s"other$i") === 1)
    assert(fps < 30, s"too many false positives: $fps")
  }

  test("TopK largest mode is unaffected by the distinct flag default") {
    val df = Seq((1.0, 10L), (3.0, 30L), (2.0, 20L), (3.0, 31L)).toDF("v", "id")
    val out = df.agg(TopK.topK(col("v"), col("id"), 2).as("t"))
      .select(transform(col("t"), _.getField("id")).as("ids"))
      .as[Seq[Long]].head()
    assert(out === Seq(30L, 31L))
  }

  test("hllEstimate: within the m=256 error bound and duplicate-insensitive") {
    val n = 5000
    // every value inserted 3 times: cardinality sketches must ignore dups
    val df = (1 to 3 * n).map(i => ("g", s"item${i % n}")).toDF("g", "v")
    val est = Sketches.hllEstimate(
      Sketches.hllSketch(df, col("v"), Seq("g"), m = 256), Seq("g"), m = 256)
      .select("est_distinct").as[Double].head()
    // raw HLL relative error ~1.04/sqrt(256) ≈ 6.5%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.26, s"est=$est")
  }

  test("hllMerge of half sketches equals the sketch of the whole") {
    val df = (1 to 2000).map(i => (s"g${i % 2}", s"x$i")).toDF("g", "v")
    val a = Sketches.hllSketch(df.filter($"v" < "x5"), col("v"), Seq("g"), m = 64)
    val b = Sketches.hllSketch(df.filter($"v" >= "x5"), col("v"), Seq("g"), m = 64)
    val merged = Sketches.hllMerge(a, b, Seq("g"))
      .orderBy("g", "bucket").collect().toSeq
    val whole = Sketches.hllSketch(df, col("v"), Seq("g"), m = 64)
      .orderBy("g", "bucket").collect().toSeq
    assert(merged === whole)
  }

  test("hll registers and estimate are repartition-stable") {
    val df = (1 to 800).map(i => ("g", s"k$i")).toDF("g", "v")
    def run(parts: Int) = Sketches.hllEstimate(
      Sketches.hllSketch(df.repartition(parts), col("v"), Seq("g"), m = 64),
      Seq("g"), m = 64).select("est_distinct").as[Double].head()
    assert(run(1) === run(7)) // bit-equal, not approximately
  }

  test("hll ignores null values (COUNT DISTINCT semantics)") {
    val df = Seq[Option[String]](Some("a"), None, Some("b"), None).toDF("v")
    val withNulls = Sketches.hllSketch(df.withColumn("g", lit("g")),
      col("v"), Seq("g"), m = 64).orderBy("bucket").collect().toSeq
    val without = Sketches.hllSketch(
      df.filter(col("v").isNotNull).withColumn("g", lit("g")),
      col("v"), Seq("g"), m = 64).orderBy("bucket").collect().toSeq
    assert(withNulls === without)
    assert(withNulls.nonEmpty)
  }

  test("hll registers fuzz-match a sequential reference implementation") {
    import graft.functions.HashKernels
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(23)
    val vals = Seq.fill(600)(s"v${rnd.nextInt(250)}")
    val m = 64
    // sequential reference: bucket = hash mod m, register = max(tz+1)
    def h(s: String) = HashKernels.md5Lower64(UTF8String.fromString(s))
    val expect = vals.distinct.map { v =>
      val bucket = (((h(v) % m) + m) % m).toInt
      val h2 = h(s"hll|$v")
      val rho = if (h2 == 0L) 64 else java.lang.Long.numberOfTrailingZeros(h2) + 1
      bucket -> rho
    }.groupBy(_._1).map { case (b, rs) => (b, rs.map(_._2).max) }
    val got = Sketches.hllSketch(vals.toDF("v").withColumn("g", lit("g")),
        col("v"), Seq("g"), m)
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(got === expect)
  }

  test("hllRho matches trailing-zeros + 1 on known hash values") {
    // derive expected rho from the actual portable hash bits
    val vals = (1 to 50).map(i => s"probe$i")
    val rhos = vals.toDF("v").select(Sketches.hllRho(col("v")).as("r"))
      .as[Int].collect()
    vals.zip(rhos).foreach { case (v, r) =>
      val h = graft.functions.HashKernels.md5Lower64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"hll|$v"))
      val expect = if (h == 0L) 64 else java.lang.Long.numberOfTrailingZeros(h) + 1
      assert(r === expect, s"value $v hash $h")
    }
  }

  // --- Misra–Gries / two-pass heavy hitters ---

  /** Zipf-ish stream: token i drawn with weight ∝ 1/(i+1), vocab ≫ k so
    * the sketch's decrement/merge-reduction paths actually run. */
  private def zipfStream(n: Int, vocab: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val weights = (0 until vocab).map(i => 1.0 / (i + 1))
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    (0 until n).map { _ =>
      val u = rnd.nextDouble()
      val i = cum.indexWhere(u <= _)
      s"tok${if (i < 0) vocab - 1 else i}"
    }
  }

  test("heavyHitters: two-pass result equals the exact groupBy+HAVING, any partitioning") {
    val items = zipfStream(n = 20000, vocab = 300, seed = 42)
    val n = items.size.toLong
    val k = 20
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c * (k + 1) > n }
    assert(exact.nonEmpty && exact.size < k, s"fixture sanity: ${exact.size} heavy")
    for (parts <- Seq(1, 7, 32)) {
      val df = items.toDF("token").repartition(parts)
      val got = Sketches.heavyHitters(df, col("token"), k)
        .as[(String, Long)].collect().toMap
      assert(got === exact, s"parts=$parts")
    }
  }

  test("MisraGries sketch: recall + error guarantee under every partitioning") {
    val items = zipfStream(n = 15000, vocab = 200, seed = 7)
    val n = items.size.toLong
    val k = 16
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 5, 17)) {
      val sk = items.toDF("token").repartition(parts)
        .agg(graft.functions.MisraGries.sketch(col("token"), k).as("mg"))
        .select(explode(col("mg")).as("e"))
        .select(col("e.token"), col("e.est")).as[(String, Long)].collect().toMap
      assert(sk.size <= k)
      sk.foreach { case (t, est) =>
        val tru = exact.getOrElse(t, 0L)
        assert(est <= tru, s"overestimate for $t: $est > $tru (parts=$parts)")
        assert(tru - est <= n / (k + 1),
          s"undercount bound broken for $t: $tru - $est > ${n / (k + 1)} (parts=$parts)")
      }
      // every token with true count strictly above n/(k+1) must be present
      exact.foreach { case (t, c) =>
        if (c * (k + 1) > n)
          assert(sk.contains(t), s"guaranteed-heavy $t missing (parts=$parts)")
      }
    }
  }

  test("heavyHitters: the recount joins the ≤k candidates as the BROADCAST side") {
    val df = zipfStream(n = 3000, vocab = 100, seed = 3).toDF("token")
    val hh = Sketches.heavyHitters(df, col("token"), k = 12)
    hh.collect()
    val p = hh.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), s"candidate join is not a broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"the item stream shuffled for the recount:\n$p")
  }

  test("MisraGries: vocab ≤ k means exact counts; nulls are not items") {
    val df = (Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c") ++
      Seq[String](null, null)).toDF("token").repartition(3)
    val sk = df.agg(graft.functions.MisraGries.sketch(col("token"), 10).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.token"), col("e.est")).as[(String, Long)].collect().toMap
    assert(sk === Map("a" -> 30L, "b" -> 20L, "c" -> 10L))
    // eval order: est DESC, token ASC — deterministic presentation
    val ordered = df.agg(graft.functions.MisraGries.sketch(col("token"), 10).as("mg"))
      .select(transform(col("mg"), e => e.getField("token")).as("t"))
      .as[Seq[String]].head()
    assert(ordered === Seq("a", "b", "c"))
  }
}
