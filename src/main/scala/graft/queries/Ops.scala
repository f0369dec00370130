package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Tables, UpdateMerge}
import graft.functions.Rand
import graft.hist.Axis
import graft.lookup.Payload
import graft.operators.Matching
import graft.stats.SelectionStats
import Compat._

/** Remaining reference-operator coverage: the diff-column merge, range-
  * list filters, deterministic smearing, 2-D veto maps, selection stats
  * over group combinations, profile summaries, and greedy matching. */
object Ops {

  def defs: Seq[QueryDef] = Seq(q51, q52, q53, q54, q55, q56, q57, q59, q60, q65, q66, q70, q78)

  /** Piecewise-linear payload interpolation (reference correctionlib
    * "linear" evaluators behind JER/pileup profiles: ak_evaluate
    * columnflow/calibration/cms/jets.py:93-142): knots ship as plan
    * literals. DuckDB evaluates the lerp with fused/eager-folded
    * arithmetic (measured 1-ulp differences vs strict IEEE order), so the
    * result follows the libm policy: round at 1e-9, far above ulp noise. */
  val q66 = {
    // the payload-file path: the interpolation knots arrive as a
    // correctionlib-style JSON document and compile through Payload.parse
    // into the identical Interp1D plan literals (lookup/Payload.scala)
    val corr = Payload.parse("""{
      "schema_version": 2,
      "corrections": [{
        "name": "value_corr", "version": 1,
        "inputs": [{"name": "value", "type": "real"}],
        "data": {"nodetype": "linear", "input": "value",
          "xs": [0.0, 10.0, 50.0, 100.0, 500.0],
          "ys": [1.1, 1.05, 0.98, 0.9, 0.85]}
      }]
    }""")("value_corr")
    QueryDef(
      "q66_interp_lookup",
      oracle = Some(s"""
        SELECT event_id, ROUND(${corr.sql("value" -> "value")}, 9) AS corr
        FROM events ORDER BY event_id"""),
      bench = true) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          round(corr("value" -> col("value")), 9).as("corr"))
        .orderBy("event_id")
    }
  }

  /** The diff-column merge as a query (SURVEY §2.4; reference
    * update_ak_array: columnflow/columnar_util.py:905-990): a calibration
    * stage emits corrected values for a subset of rows; the merge
    * overwrites base values where a diff exists and keeps them elsewhere. */
  val q51 = QueryDef(
    "q51_diff_merge",
    oracle = Some("""
      WITH diff AS (
        SELECT o_orderkey, o_totalprice * 1.05 AS o_totalprice, TRUE AS calibrated
        FROM orders WHERE o_orderpriority = '1-URGENT')
      SELECT o.o_orderpriority,
        COUNT(*) AS n,
        CAST(SUM(CAST(COALESCE(d.o_totalprice, o.o_totalprice) AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        CAST(SUM(CASE WHEN d.calibrated THEN 1 ELSE 0 END) AS BIGINT) AS n_calibrated
      FROM orders o LEFT JOIN diff d ON o.o_orderkey = d.o_orderkey
      GROUP BY 1
      ORDER BY o_orderpriority""")) { (s, dir) =>
    val base = Tables.load(s, dir, "orders")
    val diff = base.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"),
        (col("o_totalprice") * 1.05).as("o_totalprice"),
        lit(true).as("calibrated"))
    UpdateMerge.merge(base, diff, Seq("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        dsum(money(col("o_totalprice"))).as("sum_price"),
        sum(when(col("calibrated"), 1).otherwise(0)).as("n_calibrated"))
      .orderBy("o_orderpriority")
  }

  /** Range-list membership filter — the golden-JSON run/lumi filter shape
    * (reference: columnflow/selection/cms/json_filter.py:43-130): a
    * broadcast map of valid id-ranges per key, `exists` over the ranges. */
  val q52 = QueryDef(
    "q52_range_filter",
    oracle = Some("""
      SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      FROM events
      WHERE (event_type = 'click' AND (user_id BETWEEN 0 AND 30 OR user_id BETWEEN 50 AND 80))
         OR (event_type = 'view' AND user_id BETWEEN 10 AND 60)
         OR (event_type = 'purchase' AND user_id BETWEEN 40 AND 99)
      GROUP BY 1
      ORDER BY event_type""")) { (s, dir) =>
    // the lumi-mask analogue: key → list of inclusive ranges, shipped in
    // the plan (a real mask would broadcast a parsed JSON payload)
    val ranges: Map[String, Seq[(Int, Int)]] = Map(
      "click" -> Seq((0, 30), (50, 80)),
      "view" -> Seq((10, 60)),
      "purchase" -> Seq((40, 99)))
    val rangeArr = map(ranges.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), array(v.map { case (lo, hi) =>
        struct(lit(lo).as("lo"), lit(hi).as("hi"))
      }: _*))
    }: _*)
    val ev = Tables.load(s, dir, "events")
    ev.withColumn("__ranges", element_at(rangeArr, col("event_type")))
      .filter(col("__ranges").isNotNull &&
        exists(col("__ranges"), r =>
          col("user_id") >= r.getField("lo") && col("user_id") <= r.getField("hi")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
      .orderBy("event_type")
  }

  /** Deterministic per-object gaussian smearing — the JER stochastic smear
    * (reference: columnflow/calibration/cms/jets.py:917-1224, ak_random
    * columnflow/calibration/util.py:18-40) with the engine-portable RNG so
    * the oracle reproduces every smeared value exactly. */
  val q53 = QueryDef(
    "q53_gaussian_smear",
    oracle = Some {
      val key = "CAST(l_orderkey AS STRING) || '|' || CAST(l_linenumber AS STRING) || '|' || CAST(l_extendedprice AS STRING)"
      s"""
      SELECT l_returnflag,
        COUNT(*) AS n,
        CAST(SUM(CAST(ROUND(l_quantity * (1 + 0.05 * ${Rand.portableGaussianSql(key)}), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_smeared
      FROM lineitem
      GROUP BY 1
      ORDER BY l_returnflag"""
    }) { (s, dir) =>
    // NB: the key concatenation must produce identical strings in both
    // engines — longs and 2-decimal doubles both print identically.
    val key = concat_ws("|",
      col("l_orderkey").cast("string"),
      col("l_linenumber").cast("string"),
      col("l_extendedprice").cast("string"))
    val smeared = round(
      col("l_quantity") * (lit(1) + lit(0.05) * Rand.portableGaussian(key)), 6)
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum(smeared.cast("decimal(18,6)")).as("sum_smeared"))
      .orderBy("l_returnflag")
  }

  /** Hybrid JER smearing (reference jer: columnflow/calibration/cms/jets.py
    * :917-1427): per object, the resolution σ and scale factor come from
    * loaded payloads; objects with a nearest-gen match inside the
    * 3σ pt-asymmetry window take the SCALING factor
    * `1 + (sf−1)·(1 − gen_pt/pt)` (jets.py:1135), the rest take the
    * STOCHASTIC factor `1 + N(0,1)·σ·√(max(sf²−1,0))` (jets.py:1096-1114)
    * with the engine-portable RNG. Gen candidates are the event's own
    * high-quantity items with corrected momenta; matching is the q26
    * argmin shape (deterministic (metric, gpt) tiebreak), evaluated as an
    * intra-event fold — no shuffle beyond the nested build. The oracle
    * re-derives both branches from the flat table, so the hash match
    * asserts branch selection, window logic, matching, and RNG parity. */
  val q70 = {
    val cs = Payload.parse("""{
      "corrections": [
        {"name": "ptres", "inputs": [{"name": "JetPt", "type": "real"}],
         "data": {"nodetype": "binning", "input": "JetPt",
           "edges": [0.0, 20000.0, 60000.0, 200000.0],
           "content": [0.03, 0.02, 0.01], "flow": "clamp"}},
        {"name": "ptsf", "inputs": [{"name": "JetPt", "type": "real"}],
         "data": {"nodetype": "binning", "input": "JetPt",
           "edges": [0.0, 50000.0, 200000.0],
           "content": [1.2, 1.1], "flow": "clamp"}}
      ]
    }""")
    val jerC = cs("ptres"); val sfC = cs("ptsf")
    QueryDef(
      "q70_jer_hybrid",
      oracle = Some {
        val jer = jerC.sql("JetPt" -> "pt"); val sf = sfC.sql("JetPt" -> "pt")
        val key = "CAST(l_orderkey AS STRING) || '|' || CAST(l_linenumber AS STRING) || '|' || CAST(pt AS STRING)"
        val matchedCond = s"gpt IS NOT NULL AND abs(1 - gpt / pt) < 3 * $jer"
        s"""
        WITH r AS (
          SELECT l_orderkey, l_linenumber, l_extendedprice AS pt,
            ROW_NUMBER() OVER () AS rid
          FROM lineitem),
        g AS (
          SELECT l_orderkey AS gok, l_extendedprice * (1 - l_discount) AS gpt
          FROM lineitem WHERE l_quantity >= 25),
        b AS (
          SELECT rid, gpt,
            ROW_NUMBER() OVER (PARTITION BY rid ORDER BY abs(pt - gpt), gpt) AS rn
          FROM r JOIN g ON l_orderkey = gok),
        sm AS (
          SELECT r.l_orderkey, r.l_linenumber, r.pt, best.gpt
          FROM r LEFT JOIN (SELECT rid, gpt FROM b WHERE rn = 1) best USING (rid)),
        f AS (
          SELECT l_orderkey, pt,
            CASE WHEN $matchedCond THEN 1 ELSE 0 END AS matched,
            CASE WHEN $matchedCond
              THEN ${Compat.roundSql(s"1 + ($sf - 1) * (1 - gpt / pt)", 6)}
              ELSE ${Compat.roundSql(s"1 + ${Rand.portableGaussianSql(key)} * $jer * " +
                s"sqrt(GREATEST($sf * $sf - 1, 0))", 6)} END AS fac
          FROM sm)
        SELECT l_orderkey AS o_orderkey,
          COUNT(*) AS n_items,
          CAST(SUM(matched) AS BIGINT) AS n_matched,
          CAST(SUM(CAST(pt * fac AS DECIMAL(18,8)) ) AS DOUBLE) AS sum_smeared
        FROM f GROUP BY 1 ORDER BY o_orderkey"""
      }) { (s, dir) =>
      import Nested.nestedOrders
      val ev = nestedOrders(s, dir, Seq("l_linenumber", "l_quantity", "l_extendedprice", "l_discount"))
        .filter(size(col("items")) > 0)
        .withColumn("__gpts", transform(
          filter(col("items"), g => g.getField("l_quantity") >= 25),
          g => g.getField("l_extendedprice") * (lit(1) - g.getField("l_discount"))))
      val smeared = transform(col("items"), it => {
        val pt = it.getField("l_extendedprice")
        val jer = jerC("JetPt" -> pt)
        val sf = sfC("JetPt" -> pt)
        // nearest gen candidate: argmin over |pt−gpt| with gpt tiebreak
        val best = aggregate(col("__gpts"),
          struct(lit(null).cast("double").as("m"), lit(null).cast("double").as("gpt")),
          (acc, g) => {
            val m = abs(pt - g)
            val better = acc.getField("m").isNull || m < acc.getField("m") ||
              (m === acc.getField("m") && g < acc.getField("gpt"))
            when(better, struct(m.as("m"), g.as("gpt"))).otherwise(acc)
          }).getField("gpt")
        val diff = lit(1.0) - best / pt
        val matched = best.isNotNull && abs(diff) < lit(3.0) * jer
        val key = concat_ws("|", col("o_orderkey").cast("string"),
          it.getField("l_linenumber").cast("string"), pt.cast("string"))
        // factor-scale values round at 6 (tie-safe, see JecChain scaladoc);
        // the momentum product rounds at 2 in the sum below
        val scal = round(lit(1.0) + (sf - lit(1.0)) * diff, 6)
        val stoch = round(lit(1.0) + Rand.portableGaussian(key) * jer *
          sqrt(greatest(sf * sf - lit(1.0), lit(0.0))), 6)
        struct(pt.as("pt"), when(matched, scal).otherwise(stoch).as("fac"),
          matched.cast("int").as("matched"))
      })
      ev.select(
        col("o_orderkey"),
        size(col("items")).cast("long").as("n_items"),
        aggregate(smeared, lit(0L), (a, x) => a + x.getField("matched")).as("n_matched"),
        // pt (true scale 2) × fac (round-6 output, true scale 6) has true
        // scale ≤ 8, so the scale-8 cast always lands on the decimal grid
        // in both engines (double error ~5e-11 ≪ 0.5e-8) — tie-free where
        // any ROUND below scale 8 hits real .5 ties (2/15k rows measured
        // when fac degenerates to 2 decimals on self-matched jets)
        aggregate(smeared, lit(0).cast("decimal(28,8)"),
          (a, x) => (a + (x.getField("pt") * x.getField("fac"))
            .cast("decimal(18,8)")).cast("decimal(28,8)"))
          .cast("double").as("sum_smeared"))
        .orderBy("o_orderkey")
    }
  }

  /** Distributed model training end-to-end (reference MLTraining:
    * columnflow/tasks/ml.py:456): `Trainer.fitLinear` accumulates the
    * normal equations in ONE decimal-exact aggregation (quantity is
    * integer-valued and price has 2 decimals, so every moment terminates
    * at scale 2 — order-free), the 2×2 solve runs on the driver, and the
    * rounded weights re-enter the plan as literals scoring every row.
    * The oracle re-derives the closed-form solution from the same exact
    * moments; weights are rounded at 6 BEFORE prediction in both engines
    * so the per-row residuals are bit-identical, and |residual| keeps
    * its true scale-6 decimal grid for the exact sum. */
  val q78 = QueryDef(
    "q78_ml_train",
    oracle = Some("""
      WITH s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sxy
        FROM lineitem),
      w AS (
        SELECT ROUND((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 6) AS w0,
               ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS w1
        FROM s)
      SELECT l_returnflag, COUNT(*) AS n_items, w0, w1,
        CAST(SUM(CAST(ABS(l_extendedprice - (w0 + w1 * l_quantity)) AS DECIMAL(18,6))) AS DOUBLE) AS sum_abs_resid
      FROM lineitem, w
      GROUP BY 1, w0, w1
      ORDER BY l_returnflag""")) { (s, dir) =>
    import graft.ml.Trainer
    val li = Tables.load(s, dir, "lineitem")
    // ONE moment aggregation feeds everything: the closed-form weights
    // (op order mirrors the oracle SQL exactly → bit-identical doubles —
    // Trainer.solve's pivoting elimination is a different fp path at
    // ~1e-12, which a half-grid landing could amplify into a whole-query
    // mismatch) AND the solver, asserted against them so the library's
    // train path stays exercised without betting the hash on it.
    val (a, b) = Trainer.normalEquations(li, Seq(col("l_quantity")),
      col("l_extendedprice"), momentCast = _.cast("decimal(28,2)"))
    val (n, sx, sxx, sy, sxy) = (a(0)(0), a(0)(1), a(1)(1), b(0), b(1))
    val det = n * sxx - sx * sx
    val wCf = Array((sy * sxx - sx * sxy) / det, (n * sxy - sx * sy) / det)
    Trainer.solve(a, b).zip(wCf).foreach { case (ws, wc) =>
      require(math.abs(ws - wc) <= 1e-9 * math.max(1.0, math.abs(wc)),
        s"solver/closed-form disagree: $ws vs $wc") }
    // round exactly like Spark's round(): shortest-repr HALF_UP
    def r6(v: Double): Double =
      BigDecimal(java.lang.Double.toString(v))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (w0, w1) = (r6(wCf(0)), r6(wCf(1)))
    val pred = lit(w0) + lit(w1) * col("l_quantity")
    li.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_items"),
        dsum(abs(col("l_extendedprice") - pred).cast("decimal(18,6)")).as("sum_abs_resid"))
      .select(col("l_returnflag"), col("n_items"),
        lit(w0).as("w0"), lit(w1).as("w1"), col("sum_abs_resid"))
      .orderBy("l_returnflag")
  }

  /** 2-D binned veto map (reference jet veto maps:
    * columnflow/selection/cms/jets.py:30-205): a literal grid over
    * (quantity, discount), rows in flagged cells are vetoed. */
  val q54 = QueryDef(
    "q54_veto_map",
    oracle = Some {
      val lut = vetoLut
      val flag = lut.sql("l_quantity" -> "l_quantity", "l_discount" -> "l_discount")
      s"""
      SELECT l_returnflag,
        CAST(SUM(CASE WHEN $flag = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(SUM(CASE WHEN $flag = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_vetoed
      FROM lineitem
      GROUP BY 1
      ORDER BY l_returnflag"""
    }) { (s, dir) =>
    val lut = vetoLut
    val flag = lut("l_quantity" -> col("l_quantity"), "l_discount" -> col("l_discount"))
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        sum(when(flag === 0.0, 1).otherwise(0)).as("n_kept"),
        sum(when(flag === 1.0, 1).otherwise(0)).as("n_vetoed"))
      .orderBy("l_returnflag")
  }

  /** Veto grid as a loaded correctionlib-style payload (multibinning node,
    * row-major content — lookup/Payload.scala); rows flagged 1 are vetoed. */
  private def vetoLut = Payload.parse("""{
    "schema_version": 2,
    "corrections": [{
      "name": "veto_map", "version": 1,
      "inputs": [{"name": "l_quantity", "type": "real"},
                 {"name": "l_discount", "type": "real"}],
      "data": {"nodetype": "multibinning",
        "inputs": ["l_quantity", "l_discount"],
        "edges": [[0.0, 10.0, 20.0, 30.0, 40.0, 50.0],
                  [0.0, 0.02, 0.04, 0.06, 0.08, 0.1]],
        "content": [0.0, 0.0, 0.0, 1.0, 1.0,
                    0.0, 0.0, 0.0, 0.0, 1.0,
                    0.0, 0.0, 0.0, 0.0, 0.0,
                    1.0, 0.0, 0.0, 0.0, 0.0,
                    1.0, 1.0, 0.0, 0.0, 0.0],
        "flow": "clamp"}
    }]
  }""")("veto_map")

  /** Selection statistics over all group combinations via the library's
    * grouping-set aggregation (reference increment_stats:
    * columnflow/selection/stats.py:28-250, combinations :102-118). */
  val q55 = QueryDef(
    "q55_selection_stats",
    oracle = Some("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        COUNT(*) AS num_events,
        CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS num_events_selected,
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_w,
        CAST(CAST(SUM(CASE WHEN o_totalprice > 200000 THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS sum_w_selected
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY status, priority""")) { (s, dir) =>
    SelectionStats.compute(
      Tables.load(s, dir, "orders"),
      selected = col("o_totalprice") > 200000,
      weights = Map("w" -> col("o_totalprice")),
      groups = Seq("o_orderstatus", "o_orderpriority"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("num_events"), col("num_events_selected"),
        col("sum_w"), col("sum_w_selected"))
      .orderBy("status", "priority")
  }

  /** Profile summary: mean ± σ of y per x-bin from exact moment sums
    * (reference get_profile_width: columnflow/plotting/plot_util.py:933-954). */
  val q56 = QueryDef(
    "q56_profile",
    oracle = Some {
      val bin = Axis.Integer("qty", 1, 50).binIdSql("CAST(l_quantity AS INT)")
      s"""
      WITH m AS (
        SELECT $bin AS qty_bin,
          COUNT(*) AS n,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS s1,
          CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(14,4)))) AS DOUBLE) AS s2
        FROM lineitem GROUP BY 1)
      SELECT qty_bin, n, s1 / n AS mean,
        sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd
      FROM m WHERE n > 1
      ORDER BY qty_bin"""
    }) { (s, dir) =>
    val bin = Axis.Integer("qty", 1, 50).binId(col("l_quantity").cast("int"))
    Tables.load(s, dir, "lineitem")
      .groupBy(bin.as("qty_bin"))
      .agg(
        count(lit(1)).as("n"),
        dsum(money(col("l_extendedprice"))).as("s1"),
        floor(sum(col("l_extendedprice").cast("decimal(24,4)") *
          col("l_extendedprice").cast("decimal(14,4)"))).cast("double").as("s2"))
      .filter(col("n") > 1)
      .select(col("qty_bin"), col("n"), (col("s1") / col("n")).as("mean"),
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)).as("sd"))
      .orderBy("qty_bin")
  }

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`); rounded to absorb the engines' different
    * interpolation op order. At 100 TB exact percentiles need a full sort
    * per group — `approx_percentile` (t-digest) is the scale path, used
    * here as a sanity column bounded by the exact values. */
  val q59 = QueryDef(
    "q59_percentiles",
    // percentile interpolation is RATIONAL-LATTICE arithmetic over
    // lattice data, so true decimal ties at the round scale are reachable
    // at a large enough fixture. Two-layer mirror: the oracle reproduces
    // Spark's EXACT interpolation ((hi−pos)·a + (pos−lo)·b on the sorted
    // list — quantile_cont's internal formula is not contractually the
    // same IEEE expression, and a 1-ulp pre-round gap flips on ties), and
    // rounds with the Spark-semantics mirror (Compat.roundSql), not
    // DuckDB's binary-value ROUND.
    oracle = Some {
      def interp(arr: String, p: String) = {
        val pos = s"((n - 1) * $p)"
        s"""CASE WHEN FLOOR($pos) = CEIL($pos) THEN $arr[CAST($pos AS BIGINT) + 1]
            ELSE (CEIL($pos) - $pos) * $arr[CAST(FLOOR($pos) AS BIGINT) + 1]
               + ($pos - FLOOR($pos)) * $arr[CAST(CEIL($pos) AS BIGINT) + 1] END"""
      }
      s"""
      WITH s AS (
        SELECT l_returnflag, list_sort(list(CAST(l_quantity AS DOUBLE))) AS q,
          list_sort(list(CAST(l_extendedprice AS DOUBLE))) AS pr, COUNT(*) AS n
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag,
        CAST(${Compat.roundSql(interp("q", "0.5"), 6)} AS DOUBLE) AS p50,
        CAST(${Compat.roundSql(interp("q", "0.9"), 6)} AS DOUBLE) AS p90,
        CAST(${Compat.roundSql(interp("pr", "0.99"), 4)} AS DOUBLE) AS price_p99
      FROM s
      ORDER BY l_returnflag"""
    }) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("price_p99"))
      .orderBy("l_returnflag")
  }

  /** Histogram merge across partial fills (reference MergeHistograms:
    * columnflow/tasks/histograms.py:449-490): two disjoint fills union +
    * re-aggregate to exactly the single-pass fill — the file-axis merge
    * that lets 100 TB histogram in independent chunks. */
  val q60 = QueryDef(
    "q60_hist_merge",
    oracle = Some {
      val ax = Axis.Regular("price", 20, 0.0, 500000.0)
      val bin = ax.binIdSql("o_totalprice")
      s"""
      WITH parts AS (
        SELECT $bin AS price_bin,
          CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS w_even,
          CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS w_odd,
          COUNT(*) AS n
        FROM orders GROUP BY 1)
      SELECT price_bin, COALESCE(w_even, 0.0) + COALESCE(w_odd, 0.0) AS sumw, n
      FROM parts
      ORDER BY price_bin"""
    }) { (s, dir) =>
    import graft.hist.HistTable
    val ax = Axis.Regular("price", 20, 0.0, 500000.0)
    val ord = Tables.load(s, dir, "orders")
    val parts = Seq(0, 1).map { parity =>
      HistTable.fill(ord.filter(pmod(col("o_orderkey"), lit(2)) === parity),
        Seq(ax -> col("o_totalprice")), weight = col("o_totalprice"))
    }
    HistTable.merge(parts)
      .select(col("price_bin"), col("sumw"), col("n"))
      .orderBy("price_bin")
  }

  /** Greedy best-first matching with removal between two sub-collections
    * of the event (reference delta_r_match, SURVEY §7.5 hard part #2).
    * Sequential per event, embarrassingly parallel across events. The
    * algorithm is not expressible in the oracle dialect → rows-only here;
    * MatchingSpec pins the semantics against hand-computed cases. */
  val q57 = QueryDef(
    "q57_greedy_match",
    // The greedy algorithm itself, restated as a recursive CTE: each step's
    // LATERAL argmin picks the best remaining pair exactly like the fold's
    // (m, i, j) order, so even the double accumulation order matches.
    oracle = Some("""
      WITH RECURSIVE items AS (
        SELECT l_orderkey AS k, l_extendedprice AS p,
          ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber % 2
                             ORDER BY l_linenumber, l_extendedprice) - 1 AS idx,
          l_linenumber % 2 AS par
        FROM lineitem),
      cands AS (
        SELECT e.k, e.idx AS i, o.idx AS j, ABS(e.p - o.p) AS m
        FROM items e JOIN items o ON e.k = o.k AND e.par = 0 AND o.par = 1
        WHERE ABS(e.p - o.p) <= 20000.0),
      rec AS (
        SELECT k, CAST([] AS BIGINT[]) AS ui, CAST([] AS BIGINT[]) AS uj,
               CAST(0.0 AS DOUBLE) AS sm, 0 AS nm
        FROM (SELECT DISTINCT k FROM cands)
        UNION ALL
        SELECT r.k, list_append(r.ui, c.i), list_append(r.uj, c.j),
               r.sm + c.m, r.nm + 1
        FROM rec r, LATERAL (
          SELECT i, j, m FROM cands c
          WHERE c.k = r.k AND NOT list_contains(r.ui, c.i)
            AND NOT list_contains(r.uj, c.j)
          ORDER BY m, i, j LIMIT 1) c)
      SELECT k AS o_orderkey, CAST(nm AS BIGINT) AS n_matched,
             ROUND(sm, 4) AS sum_metric
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY nm DESC) AS rn
            FROM rec)
      WHERE rn = 1 AND nm > 0
      ORDER BY o_orderkey""")) { (s, dir) =>
    val ev = Nested.nestedOrders(s, dir, Seq("l_linenumber", "l_extendedprice"))
    val evens = filter(col("items"), it => it.getField("l_linenumber") % 2 === 0)
    val odds = filter(col("items"), it => it.getField("l_linenumber") % 2 === 1)
    val pairs = Matching.candidatePairs(evens, odds,
      (a, b) => abs(a.getField("l_extendedprice") - b.getField("l_extendedprice")))
    val matches = Matching.greedyMatch(pairs, maxMetric = 20000.0)
    ev.select(col("o_orderkey"), matches.as("m"))
      .filter(size(col("m")) > 0)
      .select(
        col("o_orderkey"),
        size(col("m")).cast("long").as("n_matched"),
        round(aggregate(col("m"), lit(0.0), (acc, p) => acc + p.getField("m")), 4).as("sum_metric"))
      .orderBy("o_orderkey")
  }

  /** The ML evaluate boundary as a query (reference MLEvaluation:
    * columnflow/tasks/ml.py:568 — chunked model.evaluate appending score
    * columns): a fixed linear "model" scores each embedding partition-wise
    * through `ml/Evaluator` — one mapPartitions, no shuffle, no driver
    * round-trip. Decimal accumulation keeps the score order-independent;
    * per-term rounding at 1e-9 follows the established libm/round policy. */
  val q65 = QueryDef(
    "q65_ml_score",
    oracle = Some("""
      SELECT vec_id,
        CAST(SUM(CAST(ROUND(CAST(e AS DOUBLE) * s, 9) AS DECIMAL(18,9))) AS DOUBLE) AS score
      FROM (SELECT vec_id, UNNEST(embedding) AS e,
              generate_subscripts(embedding, 1) AS s FROM embeddings) u
      GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    import org.apache.spark.sql.Row
    val model = new graft.ml.Evaluator {
      val outputSchema = StructType(Seq(StructField("score", DoubleType)))
      def evaluate(rows: Iterator[Row]): Iterator[Row] = rows.map { r =>
        val emb = r.getAs[scala.collection.Seq[Float]]("embedding")
        var acc = java.math.BigDecimal.ZERO
        var i = 0
        while (i < emb.length) {
          // BigDecimal.valueOf + HALF_UP == Spark's round(); weight = 1-based dim index
          acc = acc.add(java.math.BigDecimal.valueOf(emb(i).toDouble * (i + 1))
            .setScale(9, java.math.RoundingMode.HALF_UP))
          i += 1
        }
        Row(acc.doubleValue)
      }
    }
    graft.ml.Evaluator.score(
      Tables.load(s, dir, "embeddings").select("vec_id", "embedding"), model)
      .select("vec_id", "score")
      .orderBy("vec_id")
  }
}
