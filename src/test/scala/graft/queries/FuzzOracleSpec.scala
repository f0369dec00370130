package graft.queries

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.SparkSpec
import graft.operators.{Curation, Eval, TemporalJoin, Timeseries}
import graft.functions.Text
import scala.sys.process._

/** Property-based oracle fuzzing for PARAMETERIZED operators.
  *
  * The registry's fixed-parameter oracle rows (q95, q96, q130, q154,
  * q163, q90, q160) prove one point in each operator's parameter space;
  * a boundary bug at a parameter the registry never draws — the r4
  * liftTable remainder bug was exactly this class — sails through. This
  * spec redraws the parameters with ScalaCheck (fixed seed, so CI is
  * deterministic), re-derives the DuckDB oracle SQL for each draw, and
  * pushes every draw through the SAME engine-vs-DuckDB comparator the
  * driver uses (tools/check.py — dtype-strict, value-exact).
  *
  * 7 operators x 20 draws each. All runs execute against the driver's
  * sf0.001 fixtures; each operator's draws land in one Verify-shaped
  * output dir and one check.py invocation scores all of them.
  */
class FuzzOracleSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private val nDraws = 20

  /** Deterministic ScalaCheck draws: walk the seed chain from a fixed
    * root so every CI run sees the identical parameter sequence. */
  private def draws[T](g: Gen[T], seed: Long): Seq[T] =
    Iterator.iterate(rng.Seed(seed))(_.next).take(nDraws)
      .map(s => g.pureApply(Gen.Parameters.default, s)).toSeq

  /** JSON string escape, same contract as Verify's dump (control chars
    * would break the driver-side json.load). */
  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Write each draw's result + oracle_sql.json, then run the driver's
    * comparator once over the whole sweep. */
  private def checkSweep(tag: String, results: Seq[(String, DataFrame, String)]): Unit = {
    val out = Files.createTempDirectory(s"fuzz_$tag").toString
    results.foreach { case (name, df, _) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
    }
    val json = results.map { case (name, _, sql) => s"${jq(name)}: ${jq(sql)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$out/oracle_sql.json"), json)
    val logLines = scala.collection.mutable.ArrayBuffer[String]()
    val rc = Process(Seq("python3", "tools/check.py", sfDir, out),
      new java.io.File(sys.props.getOrElse("user.dir", "."))) ! ProcessLogger(logLines += _)
    assert(rc == 0,
      s"$tag fuzz sweep failed:\n" + logLines.filter(_.contains("FAIL")).mkString("\n"))
  }

  private def events = graft.core.Tables.load(spark, sfDir, "events")
  private def lineitem = graft.core.Tables.load(spark, sfDir, "lineitem")
  private def documents = graft.core.Tables.load(spark, sfDir, "documents")

  // ---- 1. backward as-of join: random tolerance ----------------------
  // Latest view at/before each purchase, nulled when farther back than
  // the drawn tolerance. Standard-SQL mirror (DuckDB ASOF has no
  // tolerance): latest candidate WITHIN tolerance — equivalent, because
  // any row older than the latest is farther back still.
  test("asOfJoin tolerance draws match a re-derived DuckDB oracle") {
    val tolGen = Gen.choose(3600L, 10L * 86400 * 1000000) // 1h .. 10d (us)
    val sweeps = draws(tolGen, seed = 0xA50F01L).zipWithIndex.map { case (tol, i) =>
      val ev = events.withColumn("tus", expr("ts div 1000"))
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "tus")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("tus").as("vtus"))
        .agg(max("event_id").as("view_event_id"))
      val df = TemporalJoin.asOfJoin(p, v, Seq("user_id"), "tus", "vtus",
          Seq("view_event_id", "vtus"), tolerance = Some(tol))
        .select(col("event_id"), col("user_id"), col("view_event_id"), col("vtus"))
        .orderBy("event_id")
      val sql = s"""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tus
                   FROM events WHERE event_type = 'purchase'),
        v AS (SELECT user_id, epoch_us(ts) AS vtus, MAX(event_id) AS view_event_id
              FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        j AS (SELECT p.event_id, p.user_id, v.view_event_id, v.vtus,
                ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY v.vtus DESC) AS rn
              FROM p LEFT JOIN v ON p.user_id = v.user_id
                AND v.vtus <= p.tus AND p.tus - v.vtus <= $tol)
        SELECT event_id, user_id, view_event_id, vtus
        FROM j WHERE rn = 1 ORDER BY event_id"""
      (f"asof_$i%02d", df, sql)
    }
    checkSweep("asof", sweeps)
  }

  // ---- 2. forward as-of join: random tolerance -----------------------
  test("forwardAsOfJoin tolerance draws match a re-derived DuckDB oracle") {
    val tolGen = Gen.choose(3600L, 10L * 86400 * 1000000)
    val sweeps = draws(tolGen, seed = 0xF0A50FL).zipWithIndex.map { case (tol, i) =>
      val ev = events.withColumn("tus", expr("ts div 1000"))
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "tus")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("tus").as("vtus"))
        .agg(max("event_id").as("view_event_id"))
      val df = TemporalJoin.forwardAsOfJoin(p, v, Seq("user_id"), "tus", "vtus",
          Seq("view_event_id", "vtus"), tolerance = Some(tol))
        .select(col("event_id"), col("user_id"), col("view_event_id"), col("vtus"))
        .orderBy("event_id")
      val sql = s"""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tus
                   FROM events WHERE event_type = 'purchase'),
        v AS (SELECT user_id, epoch_us(ts) AS vtus, MAX(event_id) AS view_event_id
              FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        j AS (SELECT p.event_id, p.user_id, v.view_event_id, v.vtus,
                ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY v.vtus ASC) AS rn
              FROM p LEFT JOIN v ON p.user_id = v.user_id
                AND v.vtus >= p.tus AND v.vtus - p.tus <= $tol)
        SELECT event_id, user_id, view_event_id, vtus
        FROM j WHERE rn = 1 ORDER BY event_id"""
      (f"fasof_$i%02d", df, sql)
    }
    checkSweep("fasof", sweeps)
  }

  // ---- 3. band join: random [lower, upper) window --------------------
  test("bandPairs window draws match a re-derived DuckDB oracle") {
    val bandGen = for {
      lower <- Gen.choose(-4L * 3600 * 1000000, 3600L * 1000000)
      width <- Gen.choose(60L * 1000000, 6L * 3600 * 1000000)
    } yield (lower, lower + width)
    val sweeps = draws(bandGen, seed = 0xBA4DL).zipWithIndex.map { case ((lo, hi), i) =>
      val ev = events.withColumn("tus", expr("ts div 1000"))
      val p = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "tus")
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("tus").as("ctus"), col("value"))
      val pairs = TemporalJoin.bandPairs(
        p, c, Seq("user_id"), "tus", "ctus", Seq("ctus", "value"),
        lower = lo, upper = hi)
      val agg = pairs.groupBy("event_id")
        .agg(count(lit(1)).as("nc"), sum(Compat.money(col("value"))).as("cv"))
      val df = p.join(agg, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          coalesce(col("nc"), lit(0L)).as("n_clicks"),
          coalesce(col("cv").cast("double"), lit(0.0)).as("click_value"))
        .orderBy("event_id")
      val sql = s"""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tus
                   FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id, epoch_us(ts) AS ctus, value
              FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id,
          COUNT(c.ctus) AS n_clicks,
          CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(18,4))), 0) AS DOUBLE) AS click_value
        FROM p LEFT JOIN c
          ON p.user_id = c.user_id
          AND c.ctus >= p.tus + ($lo) AND c.ctus < p.tus + ($hi)
        GROUP BY 1, 2 ORDER BY event_id"""
      (f"band_$i%02d", df, sql)
    }
    checkSweep("band", sweeps)
  }

  // ---- 4. equi-depth bins: random bin count --------------------------
  test("equiDepthBins bin-count draws match a re-derived DuckDB oracle") {
    val binsGen = Gen.choose(2, 40)
    val sweeps = draws(binsGen, seed = 0xB125L).zipWithIndex.map { case (bins, i) =>
      val ev = events.filter(col("value").isNotNull)
      val df = Eval.equiDepthBins(ev, bins, col("value"),
          Compat.money(col("value")), col("event_id"))
        .orderBy("bin")
      val sql = s"""
        WITH t AS (SELECT value, event_id FROM events WHERE value IS NOT NULL),
        b AS (SELECT value,
                CAST(NTILE($bins) OVER (ORDER BY value, event_id) AS INT) AS bin
              FROM t)
        SELECT bin, COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS mean
        FROM b GROUP BY bin ORDER BY bin"""
      (f"bins_$i%02d", df, sql)
    }
    checkSweep("bins", sweeps)
  }

  // ---- 5. winsorize: random clip percentiles -------------------------
  // pLo/pHi drawn on the k/64 grid AND the value fed in as integer cents:
  // percentile interpolation is then lo + (hi-lo)*(k/64) over integers
  // < 2^37 — EXACT in double no matter which algebraically-equivalent
  // formula an engine uses, so the bounds are bit-identical across
  // engines by construction. (Over the raw 0.01-grid doubles, Spark's
  // and DuckDB's interpolations differ in the last ulp, and ROUND(·,4)
  // at a half-boundary then splits a clip bound — 2/20 draws hit this.)
  // roundDigits=6 covers a /64 fraction's full 6-digit decimal expansion,
  // making the operator's canonicalization the identity on both sides.
  // The clipped SUM reports ×64 as BIGINT (bounds live on the /64 grid, so
  // 64·sum is an exact integer): the natural DOUBLE output hits engine
  // double-rounding — DuckDB casts decimal→double via int128→double→÷10^6
  // (two roundings) where Spark rounds once from the exact decimal, a
  // one-ulp split once sums scale past 2^53/10^6.
  test("winsorize percentile draws match a re-derived DuckDB oracle") {
    val pGen = for {
      kLo <- Gen.choose(1, 25)
      kHi <- Gen.choose(39, 63)
    } yield (kLo / 64.0, kHi / 64.0)
    val cents = lineitem.withColumn("cents",
      round(col("l_extendedprice") * 100).cast("long"))
    val sweeps = draws(pGen, seed = 0x4150L).zipWithIndex.map { case ((pLo, pHi), i) =>
      val df = Eval.winsorize(cents, "l_returnflag",
          col("cents"), pLo = pLo, pHi = pHi, roundDigits = 6)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("was_clipped"), 1L).otherwise(0L)).as("n_clipped"),
          (sum(col("clipped").cast("decimal(18,6)")) * 64)
            .cast("long").as("sum_clipped64"))
        .orderBy("l_returnflag")
      val sql = s"""
        WITH t AS (
          SELECT l_returnflag, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
          FROM lineitem),
        b AS (
          SELECT l_returnflag,
            ROUND(quantile_cont(cents, ${pLo}), 6) AS lo,
            ROUND(quantile_cont(cents, ${pHi}), 6) AS hi
          FROM t GROUP BY 1)
        SELECT t.l_returnflag, COUNT(*) AS n,
          CAST(SUM(CASE WHEN cents < lo OR cents > hi
            THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
          CAST(SUM(CAST(LEAST(GREATEST(cents, lo), hi)
            AS DECIMAL(18,6))) * 64 AS BIGINT) AS sum_clipped64
        FROM t JOIN b USING (l_returnflag)
        GROUP BY 1 ORDER BY 1"""
      (f"wins_$i%02d", df, sql)
    }
    checkSweep("wins", sweeps)
  }

  // ---- 6. sequence packing: random token budget ----------------------
  test("packSequences budget draws match a re-derived DuckDB oracle") {
    val budgetGen = Gen.choose(64L, 2048L)
    val sweeps = draws(budgetGen, seed = 0x9AC4L).zipWithIndex.map { case (budget, i) =>
      val df = Curation.packSequences(documents, budget = budget)
        .groupBy(col("source"), col("chunk_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("tokens_started"),
          sum(col("straddles").cast("long")).as("n_straddle"))
        .orderBy("source", "chunk_id")
      val sql = s"""
        WITH t AS (
          SELECT source, doc_id, CAST(${Text.tokenCountSql("text")} AS BIGINT) AS n_tok
          FROM documents),
        c AS (
          SELECT source, doc_id, n_tok,
            COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM t)
        SELECT source, CAST(cum_before // $budget AS BIGINT) AS chunk_id,
          COUNT(*) AS n_docs,
          CAST(SUM(n_tok) AS BIGINT) AS tokens_started,
          CAST(SUM(CASE WHEN cum_before % $budget + n_tok > $budget
            THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
        FROM c GROUP BY 1, 2 ORDER BY source, chunk_id"""
      (f"pack_$i%02d", df, sql)
    }
    checkSweep("pack", sweeps)
  }

  // ---- 7. resample + forward-fill: random grid step ------------------
  test("resampleFfill step draws match a re-derived DuckDB oracle") {
    val stepGen = Gen.choose(1L, 48L).map(_ * 3600L * 1000000) // 1h .. 48h
    val sweeps = draws(stepGen, seed = 0x5A3EL).zipWithIndex.map { case (step, i) =>
      val ev = events.filter(col("value").isNotNull)
        .select(col("user_id"), expr("ts div 1000").as("tus"), col("value"))
      val df = Timeseries.resampleFfill(ev, "user_id", "tus", "value", step = step)
        .select(col("user_id"), col("tick"), col("value"))
        .orderBy("user_id", "tick")
      val sql = s"""
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS tus, value
          FROM events WHERE value IS NOT NULL),
        b AS (
          SELECT user_id,
            MIN(tus) - ((MIN(tus) % $step + $step) % $step) AS lo,
            MAX(tus) - ((MAX(tus) % $step + $step) % $step) AS hi
          FROM e GROUP BY 1),
        g AS (
          SELECT user_id, unnest(generate_series(lo, hi, $step)) AS tick
          FROM b)
        SELECT g.user_id, g.tick, e.value
        FROM g ASOF LEFT JOIN e
          ON g.user_id = e.user_id AND g.tick >= e.tus
        ORDER BY g.user_id, g.tick"""
      (f"rsmp_$i%02d", df, sql)
    }
    checkSweep("rsmp", sweeps)
  }

  // ---- 8. per-group cap: random k ------------------------------------
  // The TopK-aggregate cap (q165's operator) against the window form of
  // the identical 40-bit portable hash rank, at k values the registry
  // never uses — including k=1 (argmin) and k beyond every group size
  // (cap degenerates to identity ranks).
  test("capPerGroupAgg k draws match a re-derived DuckDB oracle") {
    val kGen = Gen.choose(1, 40)
    val two40 = "1099511627776"
    val sweeps = draws(kGen, seed = 0xCA9L).zipWithIndex.map { case (k, i) =>
      val df = Curation.capPerGroupAgg(documents, k = k, groupCol = "source")
        .orderBy("source", "sample_rank")
      val h = graft.operators.Sketches.signed64FromHexSql(
        "md5('cap|' || CAST(doc_id AS VARCHAR))")
      val sql = s"""
        WITH h AS (
          SELECT source, doc_id,
            (($h % $two40) + $two40) % $two40 AS h40
          FROM documents),
        r AS (
          SELECT source, doc_id,
            ROW_NUMBER() OVER (PARTITION BY source ORDER BY h40, doc_id) AS rn
          FROM h)
        SELECT source, CAST(rn AS BIGINT) AS sample_rank, doc_id
        FROM r WHERE rn <= $k ORDER BY source, sample_rank"""
      (f"cap_$i%02d", df, sql)
    }
    checkSweep("cap", sweeps)
  }

  test("intervalOverlapPairs (cellWidth, durations) draws match a re-derived theta oracle") {
    // redraw the two duration moduli AND the grid width: widths smaller,
    // equal to, and larger than typical spans all hit the dedup rule's
    // edge cases (first-shared-cell selection across replication factors)
    val gen = for {
      vm <- Gen.choose(2, 9)
      cm <- Gen.choose(2, 9)
      wh <- Gen.choose(1, 12)
    } yield (vm, cm, wh)
    val hour = 3600000000L
    val sweeps = draws(gen, seed = 0x10AFL).zipWithIndex.map { case ((vm, cm, wh), i) =>
      val ev = events.withColumn("tus", expr("ts div 1000"))
      def win(kind: String, m: Int, idAs: String) =
        ev.filter(col("event_type") === kind)
          .select(col("user_id"), col("event_id").as(idAs),
            col("tus").as(s"${idAs}_s"),
            (col("tus") + (pmod(col("event_id"), lit(m)) + 1) * hour).as(s"${idAs}_e"))
      val df = graft.operators.TemporalJoin.intervalOverlapPairs(
          win("view", vm, "view_id"), win("click", cm, "click_id"), Seq("user_id"),
          "view_id_s", "view_id_e", "click_id_s", "click_id_e",
          rightPayload = Seq("click_id"), cellWidth = wh * hour)
        .select(col("user_id"), col("view_id"), col("click_id"),
          col("overlap_start"), col("overlap_end"))
        .orderBy("user_id", "view_id", "click_id")
      val sql = s"""
        WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS s,
                     epoch_us(ts) + (event_id % $vm + 1) * $hour AS e
                   FROM events WHERE event_type = 'view'),
        c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS s,
                epoch_us(ts) + (event_id % $cm + 1) * $hour AS e
              FROM events WHERE event_type = 'click')
        SELECT v.user_id, v.view_id, c.click_id,
          GREATEST(v.s, c.s) AS overlap_start, LEAST(v.e, c.e) AS overlap_end
        FROM v JOIN c ON v.user_id = c.user_id AND v.s < c.e AND c.s < v.e
        ORDER BY v.user_id, view_id, click_id"""
      (f"iop_$i%02d", df, sql)
    }
    checkSweep("iop", sweeps)
  }

  test("duplicateSpans (k, minOccurrences) draws match a re-derived DuckDB oracle") {
    // k spanning sub- and super-repeat widths exercises the island merge
    // at adjacency (pos == prev + k), overlap, and isolated-window edges
    val gen = for {
      k <- Gen.choose(2, 10)
      mo <- Gen.choose(2, 4)
    } yield (k, mo)
    val sweeps = draws(gen, seed = 0x59A45L).zipWithIndex.map { case ((k, mo), i) =>
      val df = graft.operators.Dedup.duplicateSpans(documents, k = k, minOccurrences = mo)
        .orderBy("doc_id", "span_start")
      val sql = s"""
        WITH t AS (SELECT doc_id, ${Text.tokensSql("text")} AS toks FROM documents),
        g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram
              FROM (SELECT doc_id, unnest(list_transform(
                      generate_series(1, len(toks)-${k - 1}),
                      q -> {'pos': q-1, 'gram': array_to_string(toks[q:q+${k - 1}], ' ')})) AS u
                    FROM t)),
        f AS (SELECT doc_id, pos FROM g
              QUALIFY COUNT(*) OVER (PARTITION BY gram) >= $mo),
        l AS (SELECT doc_id, pos,
                LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM f),
        i AS (SELECT doc_id, pos,
                SUM(CASE WHEN prev IS NULL OR pos > prev + $k THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM l)
        SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + ${k - 1} AS span_end,
               MAX(pos) + $k - MIN(pos) AS span_tokens
        FROM i GROUP BY doc_id, isl ORDER BY doc_id, span_start"""
      (f"spans_$i%02d", df, sql)
    }
    checkSweep("spans", sweeps)
  }

  test("knnLabelAccuracy (k, sampleMod) draws match a re-derived DuckDB oracle") {
    val gen = for {
      k <- Gen.choose(1, 8)
      m <- Gen.choose(3, 20)
    } yield (k, m)
    val embeddings = graft.core.Tables.load(spark, sfDir, "embeddings")
    val dotSql =
      "list_sum(list_transform(list_zip(a.embedding, q.embedding), x -> CAST(x[1] AS DOUBLE)*CAST(x[2] AS DOUBLE)))"
    def normSql(t: String) =
      s"sqrt(list_sum(list_transform($t.embedding, v -> CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))"
    val sweeps = draws(gen, seed = 0x4EE4L).zipWithIndex.map { case ((k, m), i) =>
      val df = Eval.knnLabelAccuracy(embeddings, k = k, sampleMod = m)
        .orderBy("label")
      val sql = s"""
        WITH scored AS (
          SELECT q.vec_id AS qid, q.label AS qlabel,
            a.vec_id AS neighbor, a.label AS nlabel,
            $dotSql / (${normSql("a")} * ${normSql("q")}) AS c
          FROM embeddings a JOIN embeddings q
            ON q.vec_id % $m = 0 AND a.vec_id <> q.vec_id),
        ranked AS (
          SELECT qid, qlabel, nlabel,
            ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, neighbor) AS rnk
          FROM scored),
        votes AS (SELECT qid, qlabel, nlabel, COUNT(*) AS cnt
                  FROM ranked WHERE rnk <= $k GROUP BY 1, 2, 3),
        pred AS (SELECT qid, qlabel, nlabel AS p FROM votes
                 QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cnt DESC, nlabel) = 1)
        SELECT qlabel AS label, COUNT(*) AS n_queries,
          CAST(SUM(CASE WHEN p = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        FROM pred GROUP BY 1 ORDER BY label"""
      (f"knn_$i%02d", df, sql)
    }
    checkSweep("knn", sweeps)
  }

  test("winnowFingerprints (k, window) draws match a re-derived DuckDB oracle") {
    val gen = for {
      k <- Gen.choose(2, 8)
      w <- Gen.choose(1, 12)
    } yield (k, w)
    val sweeps = draws(gen, seed = 0x3055L).zipWithIndex.map { case ((k, w), i) =>
      val df = graft.operators.Dedup.winnowFingerprints(documents, k = k, window = w)
        .orderBy("doc_id", "fp_pos", "fp_hash")
      val sig = graft.operators.Sketches.signed64FromHexSql("md5(gram)")
      val sql = s"""
        WITH t AS (SELECT doc_id, ${Text.tokensSql("text")} AS toks FROM documents),
        g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram
              FROM (SELECT doc_id, unnest(list_transform(
                      generate_series(1, len(toks)-${k - 1}),
                      q -> {'pos': q-1, 'gram': array_to_string(toks[q:q+${k - 1}], ' ')})) AS u
                    FROM t)),
        h AS (SELECT doc_id, pos,
                ((($sig) % 1099511627776 + 1099511627776) % 1099511627776) * 1048576
                  + (1048575 - pos % 1048576) AS key
              FROM g),
        w AS (SELECT doc_id, pos,
                COUNT(*) OVER (PARTITION BY doc_id) AS n,
                MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS sel
              FROM h)
        SELECT DISTINCT doc_id,
          1048575 - (sel & 1048575) AS fp_pos, sel >> 20 AS fp_hash
        FROM w WHERE pos <= GREATEST(n - $w, 0)
        ORDER BY doc_id, fp_pos, fp_hash"""
      (f"winnow_$i%02d", df, sql)
    }
    checkSweep("winnow", sweeps)
  }

  test("temperatureSample (alpha, targetTotal) draws match a re-derived DuckDB oracle") {
    val gen = for {
      a <- Gen.choose(5, 100) // alpha ·100, in (0, 1]
      t <- Gen.choose(20L, 400L)
    } yield (a / 100.0, t)
    val sweeps = draws(gen, seed = 0x7E39L).zipWithIndex.map { case ((alpha, t), i) =>
      val df = Curation.temperatureSample(documents, alpha = alpha, targetTotal = t)
        .orderBy("doc_id")
      val alphaLit = s"CAST('$alpha' AS DOUBLE)"
      val tLit = s"CAST('${t.toDouble}' AS DOUBLE)"
      val sql = s"""
        WITH n AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
        w AS (SELECT source, n, CAST(${Compat.roundSql(
          s"pow(CAST(n AS DOUBLE), $alphaLit)", 9)} AS DECIMAL(28,9)) AS w FROM n),
        tw AS (SELECT SUM(w) AS tw FROM w),
        r AS (SELECT source, ${Compat.roundSql(
          s"LEAST(CAST(1 AS DOUBLE), $tLit * (CAST(w AS DOUBLE) / CAST(tw.tw AS DOUBLE)) / n)",
          9)} AS rate
              FROM w CROSS JOIN tw)
        SELECT d.doc_id, d.source, CAST(r.rate AS DOUBLE) AS rate
        FROM documents d JOIN r USING (source)
        WHERE ${graft.functions.Rand.portableUniformSql(0, "CAST(d.doc_id AS STRING)")} < CAST(r.rate AS DOUBLE)
        ORDER BY d.doc_id"""
      (f"temp_$i%02d", df, sql)
    }
    checkSweep("temp", sweeps)
  }

  test("gopherRules threshold draws match a re-derived DuckDB oracle") {
    val gen = for {
      minW <- Gen.choose(5, 60)
      maxW <- Gen.choose(60, 120)
      minL <- Gen.choose(30, 45)   // ·0.1
      maxL <- Gen.choose(45, 60)   // ·0.1
      stop <- Gen.choose(0, 6)
    } yield (minW, maxW, minL / 10.0, maxL / 10.0, stop)
    val sweeps = draws(gen, seed = 0x60FE6L).zipWithIndex.map {
      case ((minW, maxW, minL, maxL, stop), i) =>
        val df = Curation.gopherRules(documents, minWords = minW, maxWords = maxW,
            minMeanLen = minL, maxMeanLen = maxL, minStopwordHits = stop)
          .orderBy("doc_id")
        val toks = Text.tokensSql("text")
        val stopList = Text.EnglishStopwords.map(w => s"'$w'").mkString(", ")
        def cases = s"""
            CASE WHEN n < $minW OR n > $maxW THEN 'word_count' END,
            CASE WHEN n > 0 AND (ml < CAST('$minL' AS DOUBLE) OR ml > CAST('$maxL' AS DOUBLE))
                 THEN 'mean_word_length' END,
            CASE WHEN n > 0 AND CAST(sym AS DOUBLE) / CAST(n AS DOUBLE) > CAST('0.1' AS DOUBLE)
                 THEN 'symbol_ratio' END,
            CASE WHEN st < $stop THEN 'stopword_hits' END,
            CASE WHEN gt > 0 AND CAST(gt - gd AS DOUBLE) / CAST(gt AS DOUBLE) > CAST('0.2' AS DOUBLE)
                 THEN 'dup_gram_frac' END"""
        val sql = s"""
          WITH s AS (
            SELECT doc_id, len($toks) AS n,
              ${Text.meanTokenLengthSql("text")} AS ml,
              len(regexp_replace(lower(text), '[a-z0-9 \\t\\n\\x0B\\f\\r]', '', 'g')) AS sym,
              len(list_filter($toks, w -> w IN ($stopList))) AS st,
              len(${Text.ngramsSql("text", 2)}) AS gt,
              len(list_distinct(${Text.ngramsSql("text", 2)})) AS gd
            FROM documents)
          SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
            concat_ws(',', $cases) AS failed_rules,
            concat_ws(',', $cases) = '' AS passes
          FROM s ORDER BY doc_id"""
        (f"gopher_$i%02d", df, sql)
    }
    checkSweep("gopher", sweeps)
  }

  test("dedupLines (minDf, width) draws match a re-derived DuckDB oracle") {
    // redraw BOTH the hot threshold and the line-reshape width: minDf=2
    // (everything repeated anywhere drops) through minDf far above max df
    // (no-op rewrite) and widths that shift which lines collide
    val gen = for {
      minDf <- Gen.choose(2, 30)
      w <- Gen.choose(2, 6)
    } yield (minDf, w)
    val sweeps = draws(gen, seed = 0x11DEL).zipWithIndex.map { case ((minDf, w), i) =>
      val ws = split(col("text"), " ")
      val nl = floor((size(ws) + lit(w - 1)) / lit(w.toDouble)).cast("long")
      val reshaped = documents.select(col("doc_id"),
        array_join(
          transform(sequence(lit(0L), nl - 1),
            j => array_join(slice(ws, (j * w + 1).cast("int"), lit(w)), " ")),
          "\n").as("text"))
      val df = Curation.dedupLines(reshaped, minDf = minDf.toLong).orderBy("doc_id")
      val sql = s"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        l AS (SELECT doc_id, ws,
                unnest(generate_series(0,
                  CAST(floor((len(ws) + ${w - 1}) / $w.0) AS BIGINT) - 1)) AS i
              FROM w),
        lines AS (SELECT doc_id, i AS pos,
                    array_to_string(ws[(i*$w+1):(i*$w+$w)], ' ') AS line
                  FROM l),
        hot AS (SELECT line FROM lines
                GROUP BY line HAVING COUNT(DISTINCT doc_id) >= $minDf),
        f AS (SELECT doc_id, pos, line,
                line IN (SELECT line FROM hot) AS h
              FROM lines)
        SELECT doc_id,
          COALESCE(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE NOT h),
                   '') AS kept_text,
          CAST(SUM(CASE WHEN h THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
          COUNT(*) AS n_lines
        FROM f GROUP BY doc_id ORDER BY doc_id"""
      (f"ldd_$i%02d", df, sql)
    }
    checkSweep("ldd", sweeps)
  }
}
