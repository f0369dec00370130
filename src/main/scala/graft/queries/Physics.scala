package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Route, Tables}
import graft.functions.{Rand, Seeds}
import graft.pipeline.Shift
import Compat._

/** The reference's operator catalog re-expressed over the testdata
  * (SURVEY §2.11): calibrators with shifted column families, weight
  * producers, categorization, yield tables, shift-rewritten histograms,
  * ML fold splits and intra-collection index walks. `items` plays the
  * jet collection; order-level columns play event-level quantities.
  */
object Physics {

  def defs: Seq[QueryDef] = Seq(q42, q43, q44, q45, q46, q47, q48, q49, q50,
    q69, q71, q72, q73, q74, q75, q76, q77, q81, q137, q138)

  import Nested.nestedOrders

  /** Calibrator emitting a shifted column family + the Shift alias
    * machinery re-pointing each variation onto the nominal name
    * (reference jec up/down columns: columnflow/calibration/cms/jets.py
    * :436-445; alias application columnflow/tasks/selection.py:212-217). */
  /** q42's pre-checkpoint inner frame, exposed so plan evidence can dump
    * the build the localCheckpoint otherwise hides (VERDICT r9 #2/#6). */
  def q42Inner(s: SparkSession, dir: String): DataFrame = {
    // q42 keeps only orders WITH items, so nestedOrders' left join against
    // orders (which exists to surface empty events, q20's semantics) would
    // be joined-then-filtered-away — pure exchange cost at scale
    // calibrator: nominal + up/down variations per object. The shifted
    // family evaluates directly on the flat object table — every consumer
    // is a per-order SUM, so the r9 collect_list→mapCollection→explode
    // round-trip built (and shuffled) a per-order struct array only to
    // flatten it again: the array build was pure exchange+memory cost
    // (guide §2.3 aggregate before you shuffle / §5). q20/q21 keep the
    // nested build — their outputs read positional slices of the array.
    val it = Tables.load(s, dir, "lineitem")
    val nominal = it("l_extendedprice") * (lit(1) - it("l_discount"))
    val calibrated = it.select(col("l_orderkey").as("o_orderkey"),
      nominal.as("price_cal"),
      (nominal * (lit(1) + it("l_tax"))).as("price_cal_tax_up"),
      (nominal * (lit(1) - it("l_tax"))).as("price_cal_tax_down"))
    // All shifts evaluate in ONE pass over the shared calibration build:
    // each shift's alias map names the source column it would read under
    // the nominal name — resolve that route, aggregate every shift as a
    // sibling expression (one scan, one shuffle), then unpivot. N
    // systematics cost N columns, never N passes over the data.
    val target = Route("items.price_cal")
    val shifts = Shift.Nominal +: Shift.pair("tax", "items.price_cal")
    // q62's unscaled-long aggregation: the per-item DECIMAL(18,6) cast
    // fixes the oracle's rounding, then the value rides as its unscaled
    // long (×1e6) so the three sums are long additions inside whole-stage
    // codegen instead of Decimal(28,6) box arithmetic (q62 measured 2.3×
    // on the agg alone). Safe per q62's bound: groups are per-ORDER
    // (≤13 items measured × ~1e11 unscaled ≪ 2^53) and the final
    // long→double/1e6 is correctly rounded because the unscaled sum
    // < 2^53 — Q42BoundSpec asserts the envelope with 1024× headroom.
    // Corpus-wide groups (q1/q3/q4) must NOT use this — their sums
    // outgrow 2^53.
    val sums = shifts.map { sh =>
      val src = sh.aliases.collectFirst { case (s0, `target`) => s0 }.getOrElse(target)
      val field = src.toString.stripPrefix("items.")
      sum((col(field).cast("decimal(18,6)") * lit(1000000))
        .cast("long")).as(sh.name)
    }
    val entries = shifts.flatMap(sh =>
      Seq(lit(sh.name), col(sh.name).cast("double") / 1e6))
    calibrated.groupBy("o_orderkey").agg(sums.head, sums.tail: _*)
      .select(col("o_orderkey"), explode(map(entries: _*)))
      .select(col("key").as("shift"), col("o_orderkey"), col("value").as("sum_cal"))
  }

  val q42 = QueryDef(
    "q42_calibrator_shifts",
    oracle = Some("""
      SELECT 'nominal' AS shift, l_orderkey AS o_orderkey,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_cal
      FROM lineitem GROUP BY 2
      UNION ALL
      SELECT 'tax_up', l_orderkey,
        CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE)
      FROM lineitem GROUP BY 2
      UNION ALL
      SELECT 'tax_down', l_orderkey,
        CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) * (1 - l_tax) AS DECIMAL(18,6))) AS DOUBLE)
      FROM lineitem GROUP BY 2
      ORDER BY shift, o_orderkey"""),
    bench = true) { (s, dir) =>
    // localCheckpoint before the global sort: range partitioning samples
    // its input and would otherwise execute the aggregate twice —
    // materializing the (tiny) unpivoted sums makes both passes read it
    q42Inner(s, dir)
      .localCheckpoint()
      .orderBy("shift", "o_orderkey")
  }

  /** Chained multi-level JEC (reference jec: columnflow/calibration/cms/
    * jets.py:337-830): undo the stored raw factor, fold two correction
    * LEVELS multiplicatively with each level's payload evaluated at the
    * momentum corrected so far (level 2 sees pt_raw·c1 — the chained
    * dependency), then per-SOURCE uncertainties at pt_raw give the up/down
    * families. Payloads arrive as a correctionlib-style JSON document
    * through the loader; the whole family (raw + nominal + 2×2 shifts)
    * evaluates as sibling expressions over ONE lineitem scan, unpivoted
    * like q42. */
  val q69 = {
    val cs = graft.lookup.Payload.parse("""{
      "schema_version": 2,
      "corrections": [
        {"name": "L1", "version": 1,
         "inputs": [{"name": "JetPt", "type": "real"}],
         "data": {"nodetype": "binning", "input": "JetPt",
           "edges": [0.0, 5000.0, 20000.0, 50000.0, 100000.0],
           "content": [1.02, 1.01, 0.995, 0.98], "flow": "clamp"}},
        {"name": "L2Relative", "version": 1,
         "inputs": [{"name": "JetPt", "type": "real"}],
         "data": {"nodetype": "linear", "input": "JetPt",
           "xs": [0.0, 10000.0, 60000.0, 120000.0],
           "ys": [1.05, 1.02, 0.99, 0.97]}},
        {"name": "total", "version": 1,
         "inputs": [{"name": "JetPt", "type": "real"}],
         "data": {"nodetype": "binning", "input": "JetPt",
           "edges": [0.0, 20000.0, 100000.0],
           "content": [0.02, 0.05], "flow": "clamp"}},
        {"name": "flavor", "version": 1,
         "inputs": [{"name": "JetPt", "type": "real"}],
         "data": {"nodetype": "binning", "input": "JetPt",
           "edges": [0.0, 50000.0, 100000.0],
           "content": [0.01, 0.03], "flow": "clamp"}}
      ]
    }""")
    val chain = graft.calibration.JecChain(
      levels = Seq(cs("L1"), cs("L2Relative")),
      uncSources = Seq("total" -> cs("total"), "flavor" -> cs("flavor")),
      roundDigits = 6) // factor-scale rounding validated for 1e5 momenta
    QueryDef(
      "q69_jec_chain",
      oracle = Some {
        val r = chain.sql("l_extendedprice * (1 - l_discount)")
        // Per-member rounding scale (see JecChain scaladoc): pt_raw is a
        // TRUE 4-decimal value, so a scale-6 cast is exact while a scale-2
        // round would hit real decimal ties (.xx5) — measured 114/15k
        // flips; factored members are ~13-decimal products at magnitude
        // 1e5, where only a COARSE scale keeps the binary tie window
        // (ulp(x·10^d)) negligible.
        def one(shift: String, v: String, d: Int) =
          s"""SELECT '$shift' AS shift, l_orderkey AS o_orderkey,
             CAST(SUM(CAST(${Compat.roundSql(v, d)} AS DECIMAL(18,$d))) AS DOUBLE) AS sum_pt
             FROM lineitem GROUP BY 2"""
        (("raw", r.ptRaw, 6) +: ("nominal", r.pt, 2) +: r.shifts.map { case (n, v) => (n, v, 2) })
          .map { case (n, v, d) => one(n, v, d) }
          .mkString("", " UNION ALL ", " ORDER BY shift, o_orderkey")
      }) { (s, dir) =>
      val r = chain(chain.undoRaw(col("l_extendedprice"), col("l_discount")))
      val members = ("raw", r.ptRaw, 6) +: ("nominal", r.pt, 2) +:
        r.shifts.map { case (n, v) => (n, v, 2) }
      val aggs = members.zipWithIndex.map { case ((_, v, d), i) =>
        dsum(round(v, d).cast(s"decimal(18,$d)")).as(s"__m$i")
      }
      // q42 pattern: every family member is a sibling aggregate over one
      // scan/shuffle; the tiny unpivoted result is materialized before the
      // global sort so range sampling doesn't re-run the aggregation
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(aggs.head, aggs.tail: _*)
        .select(col("o_orderkey"), explode(map(members.zipWithIndex.flatMap {
          case ((n, _, _), i) => Seq(lit(n), col(s"__m$i"))
        }: _*)))
        .select(col("key").as("shift"), col("o_orderkey"), col("value").as("sum_pt"))
        .localCheckpoint()
        .orderBy("shift", "o_orderkey")
    }
  }

  /** Quantile-map recoil correction (reference recoil_corrected_met:
    * columnflow/production/cms/dy.py:299-504): U = MET + vis − full,
    * projected onto the boson direction; U∥/U⊥ are rescaled through
    * payload-loaded QUANTILE MAPS (source CDF ∘ target inverse-CDF); the
    * corrected MET is reassembled, with response up/down variations
    * scaling the corrected U∥ (the unc-corrector shape, dy.py:421-445).
    * All geometry is trig-free IEEE arithmetic (components, not angles),
    * so per-event values are bit-identical across engines; only the final
    * outputs round (factor-scale policy). Events play the event record;
    * vectors derive from (value, user_id). */
  val q71 = {
    val cs = graft.lookup.Payload.parse("""{
      "corrections": [
        {"name": "cdf_para", "inputs": [{"name": "x", "type": "real"}],
         "data": {"nodetype": "linear", "input": "x",
           "xs": [-600.0, -50.0, 0.0, 50.0, 600.0],
           "ys": [0.0, 0.25, 0.5, 0.75, 1.0]}},
        {"name": "inv_para", "inputs": [{"name": "x", "type": "real"}],
         "data": {"nodetype": "linear", "input": "x",
           "xs": [0.0, 0.25, 0.5, 0.75, 1.0],
           "ys": [-580.0, -45.0, 5.0, 60.0, 590.0]}},
        {"name": "cdf_perp", "inputs": [{"name": "x", "type": "real"}],
         "data": {"nodetype": "linear", "input": "x",
           "xs": [-600.0, -30.0, 30.0, 600.0],
           "ys": [0.0, 0.3, 0.7, 1.0]}},
        {"name": "inv_perp", "inputs": [{"name": "x", "type": "real"}],
         "data": {"nodetype": "linear", "input": "x",
           "xs": [0.0, 0.3, 0.7, 1.0],
           "ys": [-590.0, -28.0, 32.0, 585.0]}}
      ]
    }""")
    val qmapPara = graft.calibration.QuantileMap(cs("cdf_para"), cs("inv_para"))
    val qmapPerp = graft.calibration.QuantileMap(cs("cdf_perp"), cs("inv_perp"))
    QueryDef(
      "q71_recoil_quantile",
      oracle = Some(s"""
        WITH v AS (
          SELECT event_id,
            value - 50.0 AS mx, (user_id - 50.0) * 0.8 AS my,
            value * 0.3 AS vx, user_id * 0.1 AS vy,
            value * 0.5 + 10.0 AS fx, user_id * 0.2 + 5.0 AS fy
          FROM events),
        p AS (
          SELECT *, mx + vx - fx AS ux, my + vy - fy AS uy,
            fx / sqrt(fx * fx + fy * fy) AS unx,
            fy / sqrt(fx * fx + fy * fy) AS uny
          FROM v),
        u AS (
          SELECT *, ux * unx + uy * uny AS upara,
            -ux * uny + uy * unx AS uperp
          FROM p),
        c AS (
          SELECT *, ${qmapPara.sql("upara")} AS upc, ${qmapPerp.sql("uperp")} AS upp
          FROM u),
        m AS (
          SELECT event_id, upc,
            (upc * unx - upp * uny) - vx + fx AS mcx,
            (upc * uny + upp * unx) - vy + fy AS mcy,
            (upc * 1.02 * unx - upp * uny) - vx + fx AS mux,
            (upc * 1.02 * uny + upp * unx) - vy + fy AS muy,
            (upc * 0.98 * unx - upp * uny) - vx + fx AS mdx,
            (upc * 0.98 * uny + upp * unx) - vy + fy AS mdy
          FROM c)
        SELECT event_id,
          ROUND(upc, 4) AS upara_corr,
          ROUND(sqrt(mcx * mcx + mcy * mcy), 4) AS met_pt,
          ROUND(atan2(mcy, mcx), 6) AS met_phi,
          ROUND(sqrt(mux * mux + muy * muy), 4) AS met_pt_resp_up,
          ROUND(sqrt(mdx * mdx + mdy * mdy), 4) AS met_pt_resp_down
        FROM m ORDER BY event_id""")) { (s, dir) =>
      import graft.calibration.Recoil
      import Recoil.Vec
      val ev = Tables.load(s, dir, "events").select(
        col("event_id"),
        (col("value") - 50.0).as("mx"), ((col("user_id") - 50.0) * 0.8).as("my"),
        (col("value") * 0.3).as("vx"), (col("user_id") * 0.1).as("vy"),
        (col("value") * 0.5 + 10.0).as("fx"), (col("user_id") * 0.2 + 5.0).as("fy"))
      val p = Recoil.project(
        Vec(col("mx"), col("my")), Vec(col("vx"), col("vy")), Vec(col("fx"), col("fy")))
      val staged = ev.withColumns(Map(
        "upara" -> p.upara, "uperp" -> p.uperp, "unx" -> p.unitX, "uny" -> p.unitY))
        .withColumn("upc", qmapPara(col("upara")))
        .withColumn("upp", qmapPerp(col("uperp")))
      val proj = Recoil.Projection(col("upara"), col("uperp"), col("unx"), col("uny"))
      val vis = Vec(col("vx"), col("vy")); val full = Vec(col("fx"), col("fy"))
      def pt(v: Vec): Column = sqrt(v.x * v.x + v.y * v.y)
      val nom = Recoil.reassemble(col("upc"), col("upp"), proj, vis, full)
      val up = Recoil.reassemble(col("upc") * 1.02, col("upp"), proj, vis, full)
      val dn = Recoil.reassemble(col("upc") * 0.98, col("upp"), proj, vis, full)
      staged.select(
        col("event_id"),
        round(col("upc"), 4).as("upara_corr"),
        round(pt(nom), 4).as("met_pt"),
        round(atan2(nom.y, nom.x), 6).as("met_phi"),
        round(pt(up), 4).as("met_pt_resp_up"),
        round(pt(dn), 4).as("met_pt_resp_down"))
        .orderBy("event_id")
    }
  }

  /** Transverse-sum / MET-propagation shape: per-object (pt, φ) → event
    * px/py sums (reference sum_transverse: columnflow/calibration/util.py
    * :42-57). libm terms are rounded to 1e-6 before the exact decimal sum. */
  val q43 = QueryDef(
    "q43_transverse_sum",
    oracle = Some("""
      SELECT l_orderkey AS o_orderkey,
        CAST(SUM(CAST(ROUND(l_quantity * cos(l_tax * 78.5), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_px,
        CAST(SUM(CAST(ROUND(l_quantity * sin(l_tax * 78.5), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_py,
        COUNT(*) AS n
      FROM lineitem
      GROUP BY 1
      ORDER BY o_orderkey""")) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(
        dsum(round(col("l_quantity") * cos(col("l_tax") * 78.5), 6).cast("decimal(18,6)")).as("sum_px"),
        dsum(round(col("l_quantity") * sin(col("l_tax") * 78.5), 6).cast("decimal(18,6)")).as("sum_py"),
        count(lit(1)).as("n"))
      .orderBy("o_orderkey")
  }

  /** Type-I MET propagation end-to-end (reference propagate_met:
    * columnflow/calibration/util.py:60-135, driven by jec at
    * columnflow/calibration/cms/jets.py:543-566): jets above the
    * propagation threshold contribute their calibrated-minus-raw momentum
    * difference in components, which is subtracted from the event MET;
    * pt/φ are recomputed from the shifted components. Per-event jet sums
    * have ≤7 terms, so cross-engine double-sum noise (~1e-13) sits far
    * inside the round-6 window; the libm cos/sin/atan2 1-ulp noise
    * likewise. Items play jets (pt = quantity, φ from tax), the order
    * plays the event record carrying MET. */
  val q72 = QueryDef(
    "q72_met_propagation",
    oracle = Some("""
      WITH j AS (
        SELECT l_orderkey,
          l_quantity * cos(l_tax * 62.8 - 3.14) AS px1,
          l_quantity * sin(l_tax * 62.8 - 3.14) AS py1,
          (l_quantity * (1 + l_discount)) * cos(l_tax * 62.8 - 3.14) AS px2,
          (l_quantity * (1 + l_discount)) * sin(l_tax * 62.8 - 3.14) AS py2
        FROM lineitem WHERE l_quantity > 15),
      s AS (
        SELECT l_orderkey, SUM(px2 - px1) AS dx, SUM(py2 - py1) AS dy
        FROM j GROUP BY 1),
      m AS (
        SELECT o_orderkey,
          (o_totalprice / 1000) * cos((o_orderkey % 628) / 100.0 - 3.14159)
            - COALESCE(dx, 0.0) AS mx,
          (o_totalprice / 1000) * sin((o_orderkey % 628) / 100.0 - 3.14159)
            - COALESCE(dy, 0.0) AS my
        FROM orders LEFT JOIN s ON o_orderkey = l_orderkey)
      SELECT o_orderkey,
        ROUND(sqrt(mx * mx + my * my), 6) AS met_pt,
        ROUND(atan2(my, mx), 6) AS met_phi
      FROM m ORDER BY o_orderkey""")) { (s, dir) =>
    import graft.kinematics.Kinematics
    val ev = nestedOrders(s, dir, Seq("l_linenumber", "l_quantity", "l_discount", "l_tax"))
    // reference met_prop_mask: only jets above the propagation threshold
    val masked = filter(col("items"), j => j.getField("l_quantity") > 15)
    def phiOf(j: Column): Column = j.getField("l_tax") * 62.8 - lit(3.14)
    val dx = aggregate(masked, lit(0.0), (acc, j) =>
      acc + (Kinematics.px(j.getField("l_quantity") * (lit(1) + j.getField("l_discount")), phiOf(j)) -
        Kinematics.px(j.getField("l_quantity"), phiOf(j))))
    val dy = aggregate(masked, lit(0.0), (acc, j) =>
      acc + (Kinematics.py(j.getField("l_quantity") * (lit(1) + j.getField("l_discount")), phiOf(j)) -
        Kinematics.py(j.getField("l_quantity"), phiOf(j))))
    val met = Kinematics.propagateMet(
      col("o_totalprice") / 1000,
      (col("o_orderkey") % 628) / 100.0 - lit(3.14159),
      dx, dy)
    ev.select(
      col("o_orderkey"),
      round(met.getField("pt"), 6).as("met_pt"),
      round(met.getField("phi"), 6).as("met_phi"))
      .orderBy("o_orderkey")
  }

  /** MET φ (xy) modulation correction (reference met_phi:
    * columnflow/calibration/cms/met.py:194-318): the payload is a
    * category-over-variation tree of npv-linear x/y shifts; events below
    * the beam-energy mask get px/py shifted and pt/φ recomputed, events
    * above keep their original values; pileup variations produce the
    * shifted family. */
  val q73 = {
    val cs = graft.lookup.Payload.parse("""{
      "corrections": [
        {"name": "shift_x",
         "inputs": [{"name": "variation", "type": "string"}, {"name": "npv", "type": "real"}],
         "data": {"nodetype": "category", "input": "variation", "content": [
           {"key": "nom", "value": {"nodetype": "linear", "input": "npv",
             "xs": [0.0, 60.0], "ys": [0.12, 1.14]}},
           {"key": "pu_up", "value": {"nodetype": "linear", "input": "npv",
             "xs": [0.0, 60.0], "ys": [0.10, 1.30]}},
           {"key": "pu_down", "value": {"nodetype": "linear", "input": "npv",
             "xs": [0.0, 60.0], "ys": [0.14, 0.98]}}]}},
        {"name": "shift_y",
         "inputs": [{"name": "variation", "type": "string"}, {"name": "npv", "type": "real"}],
         "data": {"nodetype": "category", "input": "variation", "content": [
           {"key": "nom", "value": {"nodetype": "linear", "input": "npv",
             "xs": [0.0, 60.0], "ys": [-0.08, 0.58]}},
           {"key": "pu_up", "value": {"nodetype": "linear", "input": "npv",
             "xs": [0.0, 60.0], "ys": [-0.06, 0.70]}},
           {"key": "pu_down", "value": {"nodetype": "linear", "input": "npv",
             "xs": [0.0, 60.0], "ys": [-0.10, 0.46]}}]}}
      ]
    }""")
    val sx = cs("shift_x"); val sy = cs("shift_y")
    val variations = Seq("nom", "pu_up", "pu_down")
    QueryDef(
      "q73_met_phi",
      oracle = Some {
        val members = variations.map { v =>
          val sxq = sx.sql("variation" -> s"'$v'", "npv" -> "npv")
          val syq = sy.sql("variation" -> s"'$v'", "npv" -> "npv")
          s"""CASE WHEN met_pt < 340
             THEN ROUND(sqrt((ROUND(met_pt * cos(met_phi), 6) - $sxq) * (ROUND(met_pt * cos(met_phi), 6) - $sxq)
               + (ROUND(met_pt * sin(met_phi), 6) - $syq) * (ROUND(met_pt * sin(met_phi), 6) - $syq)), 4)
             ELSE ROUND(met_pt, 6) END AS met_pt_$v"""
        }.mkString(", ")
        val sxn = sx.sql("variation" -> "'nom'", "npv" -> "npv")
        val syn = sy.sql("variation" -> "'nom'", "npv" -> "npv")
        s"""
        WITH m AS (
          SELECT o_orderkey, o_totalprice / 1000 AS met_pt,
            (o_orderkey % 628) / 100.0 - 3.14 AS met_phi,
            CAST(o_custkey % 60 AS DOUBLE) AS npv
          FROM orders)
        SELECT o_orderkey, $members,
          CASE WHEN met_pt < 340
            THEN ROUND(atan2(ROUND(met_pt * sin(met_phi), 6) - $syn,
                             ROUND(met_pt * cos(met_phi), 6) - $sxn), 6)
            ELSE ROUND(met_phi, 6) END AS met_phi_nom
        FROM m ORDER BY o_orderkey"""
      }) { (s, dir) =>
      val m = Tables.load(s, dir, "orders").select(
        col("o_orderkey"),
        (col("o_totalprice") / 1000).as("met_pt"),
        ((col("o_orderkey") % 628) / 100.0 - lit(3.14)).as("met_phi"),
        (col("o_custkey") % 60).cast("double").as("npv"))
      val mask = col("met_pt") < 340
      val pxr = round(col("met_pt") * cos(col("met_phi")), 6)
      val pyr = round(col("met_pt") * sin(col("met_phi")), 6)
      def shifted(v: String): (Column, Column) = (
        pxr - sx("variation" -> lit(v), "npv" -> col("npv")),
        pyr - sy("variation" -> lit(v), "npv" -> col("npv")))
      val ptCols = variations.map { v =>
        val (x, y) = shifted(v)
        when(mask, round(sqrt(x * x + y * y), 4))
          .otherwise(round(col("met_pt"), 6)).as(s"met_pt_$v")
      }
      val (xn, yn) = shifted("nom")
      val phiNom = when(mask, round(atan2(yn, xn), 6))
        .otherwise(round(col("met_phi"), 6)).as("met_phi_nom")
      m.select(col("o_orderkey") +: ptCols :+ phiNom: _*).orderBy("o_orderkey")
    }
  }

  /** Tau energy correction (reference tec:
    * columnflow/calibration/cms/tau.py:62-263): scale factors are a
    * decay-mode-keyed payload (INTEGER category keys) with per-systematic
    * sub-categories; unsupported decay modes fall through to the payload
    * default (scale 1, the reference's dm_mask), and objects whose
    * gen-match value is unhandled are reset to 1 for nominal AND
    * variations (tau.py:139-151). Exact decimal scales throughout: payload
    * scalars have ≤3 decimals, so pt·scale casts exactly at scale 5. */
  val q74 = {
    val cs = graft.lookup.Payload.parse("""{
      "corrections": [
        {"name": "tes",
         "inputs": [{"name": "dm", "type": "int"}, {"name": "syst", "type": "string"}],
         "data": {"nodetype": "category", "input": "dm", "content": [
           {"key": 0, "value": {"nodetype": "category", "input": "syst", "content": [
             {"key": "nom", "value": 0.99}, {"key": "up", "value": 1.01}, {"key": "down", "value": 0.97}]}},
           {"key": 1, "value": {"nodetype": "category", "input": "syst", "content": [
             {"key": "nom", "value": 0.995}, {"key": "up", "value": 1.015}, {"key": "down", "value": 0.975}]}},
           {"key": 10, "value": {"nodetype": "category", "input": "syst", "content": [
             {"key": "nom", "value": 1.005}, {"key": "up", "value": 1.02}, {"key": "down", "value": 0.99}]}},
           {"key": 11, "value": {"nodetype": "category", "input": "syst", "content": [
             {"key": "nom", "value": 1.01}, {"key": "up", "value": 1.03}, {"key": "down", "value": 0.995}]}}],
           "default": 1.0}}
      ]
    }""")
    val tes = cs("tes")
    QueryDef(
      "q74_tec",
      oracle = Some {
        def scale(syst: String) = {
          val sf = tes.sql("dm" -> "dm", "syst" -> s"'$syst'")
          s"CASE WHEN genmatch < 1 OR genmatch > 5 THEN 1.0 ELSE $sf END"
        }
        // exactDoubleSql: per-returnflag scale-5 sums pass unscaled 2^53
        // at sf10 (20M rows × pt≈1e5 → 2e17), where DuckDB's direct
        // decimal→double cast double-rounds — the sweep's 2⁻¹⁴ diff
        def member(syst: String) =
          s"${Compat.exactDoubleSql(s"SUM(CAST(pt * (${scale(syst)}) AS DECIMAL(18,5)))")} AS sum_$syst"
        s"""
        WITH t AS (
          SELECT l_returnflag, l_extendedprice AS pt,
            l_linenumber % 13 AS dm, l_suppkey % 7 AS genmatch
          FROM lineitem)
        SELECT l_returnflag,
          COUNT(*) AS n,
          CAST(SUM(CASE WHEN genmatch < 1 OR genmatch > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_reset,
          ${member("nom")}, ${member("up")}, ${member("down")}
        FROM t GROUP BY 1 ORDER BY l_returnflag"""
      }) { (s, dir) =>
      val t = Tables.load(s, dir, "lineitem").select(
        col("l_returnflag"), col("l_extendedprice").as("pt"),
        (col("l_linenumber") % 13).as("dm"), (col("l_suppkey") % 7).as("genmatch"))
      val reset = col("genmatch") < 1 || col("genmatch") > 5
      def scale(syst: String): Column =
        when(reset, 1.0).otherwise(tes("dm" -> col("dm"), "syst" -> lit(syst)))
      t.groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(reset.cast("int")).cast("long").as("n_reset"),
          dsum((col("pt") * scale("nom")).cast("decimal(18,5)")).as("sum_nom"),
          dsum((col("pt") * scale("up")).cast("decimal(18,5)")).as("sum_up"),
          dsum((col("pt") * scale("down")).cast("decimal(18,5)")).as("sum_down"))
        .orderBy("l_returnflag")
    }
  }

  /** Muon momentum scale/resolution, Rochester-style (reference muon_sr:
    * columnflow/calibration/cms/muon.py:61): the multiplicative scale is a
    * 2-D (η, φ)-binned payload applied to every object; "MC" objects
    * additionally smear by 1 + σ(η)·N(0,1) with the engine-portable RNG
    * (data/MC branch per object here, flag-driven). The smear factor
    * rounds at 3 digits so pt·k·smear stays on the scale-8 decimal grid
    * (pt 2 + k 3 + smear 3 — tie-free casts); grouping is per order so
    * unscaled decimal sums stay far below 2^53. */
  val q75 = {
    val cs = graft.lookup.Payload.parse("""{
      "corrections": [
        {"name": "k",
         "inputs": [{"name": "eta", "type": "real"}, {"name": "phi", "type": "real"}],
         "data": {"nodetype": "multibinning", "inputs": ["eta", "phi"],
           "edges": [[-1.0, -0.3, 0.3, 1.0], [-3.2, 0.0, 3.2]],
           "content": [0.985, 1.015, 0.995, 1.005, 1.02, 0.98], "flow": "clamp"}},
        {"name": "sigma",
         "inputs": [{"name": "eta", "type": "real"}],
         "data": {"nodetype": "binning", "input": "eta",
           "edges": [-1.0, 0.0, 1.0], "content": [0.02, 0.04], "flow": "clamp"}}
      ]
    }""")
    val kC = cs("k"); val sigC = cs("sigma")
    QueryDef(
      "q75_muon_sr",
      oracle = Some {
        val k = kC.sql("eta" -> "eta", "phi" -> "phi")
        val sig = sigC.sql("eta" -> "eta")
        val gkey = "CAST(l_orderkey AS STRING) || '|' || CAST(l_linenumber AS STRING) || '|' || CAST(pt AS STRING)"
        s"""
        WITH m AS (
          SELECT l_orderkey, l_linenumber, l_extendedprice AS pt,
            l_tax * 25 - 1 AS eta, l_discount * 62.8 - 3.14 AS phi,
            l_returnflag = 'R' AS is_data
          FROM lineitem),
        c AS (
          SELECT l_orderkey, is_data,
            pt * ($k) * (CASE WHEN is_data THEN 1.0
              ELSE ROUND(1 + ($sig) * ${Rand.portableGaussianSql(gkey)}, 3) END) AS pt_corr
          FROM m)
        SELECT l_orderkey AS o_orderkey,
          COUNT(*) AS n,
          CAST(SUM(CASE WHEN is_data THEN 0 ELSE 1 END) AS BIGINT) AS n_mc,
          CAST(SUM(CAST(pt_corr AS DECIMAL(18,8))) AS DOUBLE) AS sum_corr
        FROM c GROUP BY 1 ORDER BY o_orderkey"""
      }) { (s, dir) =>
      val m = Tables.load(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice").as("pt"),
        (col("l_tax") * 25 - 1).as("eta"), (col("l_discount") * 62.8 - lit(3.14)).as("phi"),
        (col("l_returnflag") === "R").as("is_data"))
      val gkey = concat_ws("|", col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"), col("pt").cast("string"))
      val k = kC("eta" -> col("eta"), "phi" -> col("phi"))
      val smear = when(col("is_data"), 1.0).otherwise(
        round(lit(1) + sigC("eta" -> col("eta")) * Rand.portableGaussian(gkey), 3))
      // group key == sort key at ~n/4 cardinality: range-partitioning the
      // projected scan serves both the aggregation and the final sort with
      // one exchange (the q62 pattern, SCALE.md "Global sorts")
      m.select(col("l_orderkey"), col("is_data"),
        (col("pt") * k * smear).as("pt_corr"))
        .repartitionByRange(col("l_orderkey"))
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("is_data"), 0).otherwise(1)).cast("long").as("n_mc"),
          dsum(col("pt_corr").cast("decimal(18,8)")).as("sum_corr"))
        .orderBy("o_orderkey")
    }
  }

  /** Type-I MET propagation through the JEC chain (reference jec:
    * columnflow/calibration/cms/jets.py:493-566): the recommendation is to
    * propagate only L2-and-onward corrections, so MET moves by the vector
    * difference between the jet system corrected with ALL levels and the
    * system corrected with the type-1 SUBSET (L1 only), over the
    * propagation mask — composing two JecChains (shared L1) with
    * `propagateMet`. Per-term px/py round at 6 (jet pt ≈ 50-scale) before
    * the exact decimal event sums, so the oracle reproduces every value. */
  val q76 = {
    val cs = graft.lookup.Payload.parse("""{
      "corrections": [
        {"name": "L1", "inputs": [{"name": "JetPt", "type": "real"}],
         "data": {"nodetype": "binning", "input": "JetPt",
           "edges": [0.0, 10.0, 25.0, 60.0], "content": [1.05, 1.02, 0.99], "flow": "clamp"}},
        {"name": "L2", "inputs": [{"name": "JetPt", "type": "real"}],
         "data": {"nodetype": "linear", "input": "JetPt",
           "xs": [0.0, 20.0, 60.0], "ys": [1.04, 1.01, 0.98]}}
      ]
    }""")
    val subset = graft.calibration.JecChain(levels = Seq(cs("L1")))
    val full = graft.calibration.JecChain(levels = Seq(cs("L1"), cs("L2")))
    QueryDef(
      "q76_jec_met_chain",
      oracle = Some {
        val ptRaw = "l_quantity * (1 - l_discount)"
        val ptSub = subset.sql(ptRaw).pt
        val ptFull = full.sql(ptRaw).pt
        s"""
        WITH j AS (
          SELECT l_orderkey,
            ROUND(($ptSub) * cos(l_tax * 62.8 - 3.14159), 6) AS px_sub,
            ROUND(($ptSub) * sin(l_tax * 62.8 - 3.14159), 6) AS py_sub,
            ROUND(($ptFull) * cos(l_tax * 62.8 - 3.14159), 6) AS px_full,
            ROUND(($ptFull) * sin(l_tax * 62.8 - 3.14159), 6) AS py_full
          FROM lineitem WHERE ($ptRaw) > 10),
        s AS (
          SELECT l_orderkey,
            CAST(SUM(CAST(px_full AS DECIMAL(18,6))) - SUM(CAST(px_sub AS DECIMAL(18,6))) AS DOUBLE) AS dx,
            CAST(SUM(CAST(py_full AS DECIMAL(18,6))) - SUM(CAST(py_sub AS DECIMAL(18,6))) AS DOUBLE) AS dy
          FROM j GROUP BY 1),
        m AS (
          SELECT o_orderkey,
            (o_totalprice / 1000) * cos((o_orderkey % 628) / 100.0 - 3.14159)
              - COALESCE(dx, 0.0) AS mx,
            (o_totalprice / 1000) * sin((o_orderkey % 628) / 100.0 - 3.14159)
              - COALESCE(dy, 0.0) AS my
          FROM orders LEFT JOIN s ON o_orderkey = l_orderkey)
        SELECT o_orderkey,
          ROUND(sqrt(mx * mx + my * my), 6) AS met_pt,
          ROUND(atan2(my, mx), 6) AS met_phi
        FROM m ORDER BY o_orderkey"""
      }) { (s, dir) =>
      import graft.kinematics.Kinematics
      val ev = nestedOrders(s, dir, Seq("l_linenumber", "l_quantity", "l_discount", "l_tax"))
      def ptRaw(j: Column) = j.getField("l_quantity") * (lit(1) - j.getField("l_discount"))
      def phiOf(j: Column) = j.getField("l_tax") * 62.8 - lit(3.14159)
      // reference met_prop_mask on the RAW momentum (jets.py:509-511)
      val masked = filter(col("items"), j => ptRaw(j) > 10)
      def sumDiff(px: Boolean): Column = {
        def term(chain: graft.calibration.JecChain, j: Column): Column = {
          val pt = chain(ptRaw(j)).pt
          round(if (px) Kinematics.px(pt, phiOf(j)) else Kinematics.py(pt, phiOf(j)), 6)
            .cast("decimal(18,6)")
        }
        def dsumArr(f: Column => Column): Column =
          aggregate(masked, lit(0).cast("decimal(28,6)"),
            (acc, j) => (acc + f(j)).cast("decimal(28,6)"))
        (dsumArr(term(full, _)) - dsumArr(term(subset, _))).cast("double")
      }
      val met = Kinematics.propagateMet(
        col("o_totalprice") / 1000,
        (col("o_orderkey") % 628) / 100.0 - lit(3.14159),
        sumDiff(px = true), sumDiff(px = false))
      ev.select(
        col("o_orderkey"),
        round(met.getField("pt"), 6).as("met_pt"),
        round(met.getField("phi"), 6).as("met_phi"))
        .orderBy("o_orderkey")
    }
  }

  /** Electron/photon energy scale & smearing (reference
    * _egamma_scale_smear: columnflow/calibration/cms/egamma.py:77-290):
    * DATA objects get the multiplicative scale from a gain-keyed,
    * η-binned payload, with scale_up/down = pt·(scale ± unc) applied to
    * data ONLY (MC passes nominal through); MC objects get the gaussian
    * smear 1 + width(η, r9)·N(0,1) with the portable RNG, with
    * smear_up/down varying the width — the mirror image of the family,
    * applied to MC only. All five members are sibling aggregates over one
    * scan with the single-exchange range-partition plan. Exact decimal
    * scales: data products terminate at ≤6, MC products at ≤8 (rounded
    * factor) → one scale-8 sum is exact for both. */
  val q81 = {
    val cs = graft.lookup.Payload.parse("""{
      "corrections": [
        {"name": "scale",
         "inputs": [{"name": "gain", "type": "int"}, {"name": "eta", "type": "real"}],
         "data": {"nodetype": "category", "input": "gain", "content": [
           {"key": 0, "value": {"nodetype": "binning", "input": "eta",
             "edges": [-1.0, 0.0, 1.0], "content": [1.002, 0.998], "flow": "clamp"}},
           {"key": 1, "value": {"nodetype": "binning", "input": "eta",
             "edges": [-1.0, 0.0, 1.0], "content": [1.004, 0.996], "flow": "clamp"}},
           {"key": 2, "value": 1.001}]}},
        {"name": "scale_unc", "inputs": [{"name": "eta", "type": "real"}],
         "data": {"nodetype": "binning", "input": "eta",
           "edges": [-1.0, 0.0, 1.0], "content": [0.002, 0.003], "flow": "clamp"}},
        {"name": "width",
         "inputs": [{"name": "eta", "type": "real"}, {"name": "r9", "type": "real"}],
         "data": {"nodetype": "multibinning", "inputs": ["eta", "r9"],
           "edges": [[-1.0, 0.0, 1.0], [0.0, 0.5, 1.0]],
           "content": [0.01, 0.015, 0.02, 0.025], "flow": "clamp"}},
        {"name": "width_unc", "inputs": [{"name": "eta", "type": "real"}],
         "data": {"nodetype": "binning", "input": "eta",
           "edges": [-1.0, 0.0, 1.0], "content": [0.002, 0.004], "flow": "clamp"}}
      ]
    }""")
    val scaleC = cs("scale"); val suncC = cs("scale_unc")
    val widthC = cs("width"); val wuncC = cs("width_unc")
    QueryDef(
      "q81_egamma_scale_smear",
      oracle = Some {
        val sc = scaleC.sql("gain" -> "gain", "eta" -> "eta")
        val su = suncC.sql("eta" -> "eta")
        val wd = widthC.sql("eta" -> "eta", "r9" -> "r9")
        val wu = wuncC.sql("eta" -> "eta")
        val gkey = "CAST(l_orderkey AS STRING) || '|' || CAST(l_linenumber AS STRING) || '|' || CAST(pt AS STRING)"
        val g = Rand.portableGaussianSql(gkey)
        def mem(name: String, dataExpr: String, mcExpr: String) =
          s"CAST(SUM(CAST(CASE WHEN is_data THEN $dataExpr ELSE $mcExpr END AS DECIMAL(18,8))) AS DOUBLE) AS sum_$name"
        s"""
        WITH m AS (
          SELECT l_orderkey, l_linenumber, l_extendedprice AS pt,
            l_tax * 25 - 1 AS eta, l_discount * 10 AS r9,
            l_linenumber % 3 AS gain, l_returnflag = 'R' AS is_data
          FROM lineitem)
        SELECT l_orderkey AS o_orderkey,
          COUNT(*) AS n,
          ${mem("nominal", s"pt * ($sc)", s"pt * ROUND(1 + ($wd) * $g, 6)")},
          ${mem("scale_up", s"pt * (($sc) + ($su))", s"pt * ROUND(1 + ($wd) * $g, 6)")},
          ${mem("scale_down", s"pt * (($sc) - ($su))", s"pt * ROUND(1 + ($wd) * $g, 6)")},
          ${mem("smear_up", s"pt * ($sc)", s"pt * ROUND(1 + (($wd) + ($wu)) * $g, 6)")},
          ${mem("smear_down", s"pt * ($sc)", s"pt * ROUND(1 + (($wd) - ($wu)) * $g, 6)")}
        FROM m GROUP BY 1 ORDER BY o_orderkey"""
      }) { (s, dir) =>
      val gkey = concat_ws("|", col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"), col("pt").cast("string"))
      val m = Tables.load(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice").as("pt"),
        (col("l_tax") * 25 - 1).as("eta"), (col("l_discount") * 10).as("r9"),
        (col("l_linenumber") % 3).as("gain"), (col("l_returnflag") === "R").as("is_data"))
        // one RNG draw per row, projected BEFORE the aggregate: five
        // sibling members reference the same attribute instead of five
        // inline md5+Box-Muller expansions (aggregate inputs don't share
        // subexpressions across siblings)
        .withColumn("g", Rand.portableGaussian(gkey))
      val g = col("g")
      val sc = scaleC("gain" -> col("gain"), "eta" -> col("eta"))
      val su = suncC("eta" -> col("eta"))
      val wd = widthC("eta" -> col("eta"), "r9" -> col("r9"))
      val wu = wuncC("eta" -> col("eta"))
      def mem(name: String, dataExpr: Column, mcExpr: Column) =
        dsum(when(col("is_data"), dataExpr).otherwise(mcExpr)
          .cast("decimal(18,8)")).as(s"sum_$name")
      m.repartitionByRange(col("l_orderkey"))
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(
          count(lit(1)).as("n"),
          mem("nominal", col("pt") * sc, col("pt") * round(lit(1) + wd * g, 6)),
          mem("scale_up", col("pt") * (sc + su), col("pt") * round(lit(1) + wd * g, 6)),
          mem("scale_down", col("pt") * (sc - su), col("pt") * round(lit(1) + wd * g, 6)),
          mem("smear_up", col("pt") * sc, col("pt") * round(lit(1) + (wd + wu) * g, 6)),
          mem("smear_down", col("pt") * sc, col("pt") * round(lit(1) + (wd - wu) * g, 6)))
        .orderBy("o_orderkey")
    }
  }

  /** Drell-Yan ptll reweighting (reference dy_weights:
    * columnflow/production/cms/dy.py:132-298): the weight is a
    * systematic-keyed payload evaluated at the gen-dilepton pt — here the
    * transverse momentum of the event's item system (q43's decimal-exact
    * px/py sums), pushed through per-syst linear payload nodes. */
  val q77 = {
    val cs = graft.lookup.Payload.parse("""{
      "corrections": [
        {"name": "DY_pTll_reweighting",
         "inputs": [{"name": "syst", "type": "string"}, {"name": "ptll", "type": "real"}],
         "data": {"nodetype": "category", "input": "syst", "content": [
           {"key": "nom", "value": {"nodetype": "linear", "input": "ptll",
             "xs": [0.0, 50.0, 150.0, 400.0], "ys": [1.08, 1.02, 0.96, 0.9]}},
           {"key": "up1", "value": {"nodetype": "linear", "input": "ptll",
             "xs": [0.0, 50.0, 150.0, 400.0], "ys": [1.12, 1.05, 0.98, 0.92]}},
           {"key": "down1", "value": {"nodetype": "linear", "input": "ptll",
             "xs": [0.0, 50.0, 150.0, 400.0], "ys": [1.04, 0.99, 0.94, 0.88]}}]}}
      ]
    }""")
    val dy = cs("DY_pTll_reweighting")
    QueryDef(
      "q77_dy_ptll_weight",
      oracle = Some {
        def w(syst: String) =
          s"ROUND(${dy.sql("syst" -> s"'$syst'", "ptll" -> "ptll")}, 6) AS dy_weight_$syst"
        s"""
        WITH s AS (
          SELECT l_orderkey,
            CAST(SUM(CAST(ROUND(l_quantity * cos(l_tax * 78.5), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_px,
            CAST(SUM(CAST(ROUND(l_quantity * sin(l_tax * 78.5), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_py
          FROM lineitem GROUP BY 1),
        p AS (SELECT l_orderkey, sqrt(sum_px * sum_px + sum_py * sum_py) AS ptll FROM s)
        SELECT l_orderkey AS o_orderkey, ROUND(ptll, 6) AS ptll,
          ${w("nom")}, ${w("up1")}, ${w("down1")}
        FROM p ORDER BY o_orderkey"""
      }) { (s, dir) =>
      val sums = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_tax")
        .repartitionByRange(col("l_orderkey"))  // q62 pattern: one exchange
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(
          dsum(round(col("l_quantity") * cos(col("l_tax") * 78.5), 6).cast("decimal(18,6)")).as("sum_px"),
          dsum(round(col("l_quantity") * sin(col("l_tax") * 78.5), 6).cast("decimal(18,6)")).as("sum_py"))
      val p = sums.withColumn("ptll",
        sqrt(col("sum_px") * col("sum_px") + col("sum_py") * col("sum_py")))
      def w(syst: String): Column =
        round(dy("syst" -> lit(syst), "ptll" -> col("ptll")), 6).as(s"dy_weight_$syst")
      p.select(col("o_orderkey"), round(col("ptll"), 6).as("ptll"),
        w("nom"), w("up1"), w("down1"))
        .orderBy("o_orderkey")
    }
  }

  /** Normalization weights: the two-pass stats → broadcast-LUT pattern
    * (reference: columnflow/production/normalization.py:300-616 — lumi·σ/Σw
    * per process). Processes = market segments, σ = a literal table. */
  val q44 = QueryDef(
    "q44_normalization_weight",
    oracle = Some("""
      WITH stats AS (
        SELECT c_mktsegment,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sumw
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1)
      SELECT c_mktsegment, n_orders, sumw,
        1000.0 * (CASE c_mktsegment
          WHEN 'AUTOMOBILE' THEN 2.5 WHEN 'BUILDING' THEN 1.5
          WHEN 'FURNITURE' THEN 3.0 WHEN 'HOUSEHOLD' THEN 0.5
          ELSE 1.0 END) / sumw AS norm_weight
      FROM stats
      ORDER BY c_mktsegment""")) { (s, dir) =>
    val xs: Column = col("c_mktsegment") match { case seg =>
      when(seg === "AUTOMOBILE", 2.5).when(seg === "BUILDING", 1.5)
        .when(seg === "FURNITURE", 3.0).when(seg === "HOUSEHOLD", 0.5)
        .otherwise(1.0)
    }
    Tables.load(s, dir, "orders")
      .join(broadcast(Tables.load(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum(money(col("o_totalprice"))).as("sumw"))
      .select(col("c_mktsegment"), col("n_orders"), col("sumw"),
        (lit(1000.0) * xs / col("sumw")).as("norm_weight"))
      .orderBy("c_mktsegment")
  }

  /** Per-object scale-factor product → per-event weight, in log space so
    * the cross-engine sum is order-independent (reference btag SF product:
    * columnflow/production/cms/btag.py:83-350). */
  val q45 = QueryDef(
    "q45_sf_product",
    oracle = Some(s"""
      SELECT l_orderkey AS o_orderkey,
        CAST(SUM(CAST(${Compat.roundSql("ln(1 + l_discount)", 9)} AS DECIMAL(18,9))) AS DOUBLE) AS sum_log_sf,
        COUNT(*) AS n_items
      FROM lineitem
      GROUP BY 1
      ORDER BY o_orderkey""")) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(
        dsum(round(log(lit(1) + col("l_discount")), 9).cast("decimal(18,9)")).as("sum_log_sf"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderkey")
  }

  /** Categorization: named boolean masks → per-event category-id array →
    * exploded counts (reference category_ids producer:
    * columnflow/production/categories.py:31-105). */
  val q46 = QueryDef(
    "q46_category_ids",
    oracle = Some("""
      SELECT cat_id, n FROM (
        SELECT CAST(1 AS BIGINT) AS cat_id, COUNT(*) AS n FROM orders WHERE o_totalprice > 150000
        UNION ALL
        SELECT 2, COUNT(*) FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT 3, COUNT(*) FROM orders WHERE o_orderstatus = 'F')
      ORDER BY cat_id""")) { (s, dir) =>
    import graft.ops.Categorizer
    val cats: Seq[Categorizer] = Seq(
      new Categorizer { val name = "high_value"; val id = 1L
        def mask(df: DataFrame) = df("o_totalprice") > 150000 },
      new Categorizer { val name = "urgent"; val id = 2L
        def mask(df: DataFrame) = df("o_orderpriority") === "1-URGENT" },
      new Categorizer { val name = "finished"; val id = 3L
        def mask(df: DataFrame) = df("o_orderstatus") === "F" })
    val ord = Tables.load(s, dir, "orders")
    val ids = array_compact(array(cats.map(c =>
      when(c.mask(ord), lit(c.id)).otherwise(lit(null))): _*))
    ord.select(explode(ids).as("cat_id"))
      .groupBy("cat_id").agg(count(lit(1)).as("n"))
      .orderBy("cat_id")
  }

  /** Yield table: process × category pivot with decimal-exact sums
    * (reference CreateYieldTable: columnflow/tasks/yields.py:136-267). */
  val q47 = QueryDef(
    "q47_yield_table",
    oracle = Some("""
      SELECT c_mktsegment,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
        CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
        CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS P
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""")) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .join(broadcast(Tables.load(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum(money(col("o_totalprice"))))
      .orderBy("c_mktsegment")
  }

  /** Shift-rewritten histogram family: one weight column + up/down
    * variations, re-aliased per shift by the Shift machinery, filled into
    * the same binning (reference MergeShiftedHistograms:
    * columnflow/tasks/histograms.py:589-623). */
  val q48 = QueryDef(
    "q48_shifted_hist",
    oracle = Some {
      val ax = graft.hist.Axis.Regular("price", 20, 0.0, 500000.0)
      val bin = ax.binIdSql("o_totalprice")
      // weights stay at intended decimal scale 3 (price has 2, ×1.1 adds
      // one) under a scale-4 cast: casts that never need to round are the
      // only ones that are cross-engine safe — Spark rounds the double's
      // shortest decimal representation while DuckDB rounds the exact
      // binary value, and the two disagree on values AT a scale tie.
      def one(shift: String, w: String) =
        s"""SELECT '$shift' AS shift, $bin AS price_bin,
           CAST(SUM(CAST($w AS DECIMAL(18,4))) AS DOUBLE) AS sumw
           FROM orders GROUP BY 2"""
      s"""${one("nominal", "o_totalprice")}
         UNION ALL ${one("scale_up", "o_totalprice * 1.1")}
         UNION ALL ${one("scale_down", "o_totalprice * 0.9")}
         ORDER BY shift, price_bin"""
    }) { (s, dir) =>
    val ax = graft.hist.Axis.Regular("price", 20, 0.0, 500000.0)
    val ord = Tables.load(s, dir, "orders")
      .withColumn("weight", col("o_totalprice"))
      .withColumn("weight_scale_up", col("weight") * 1.1)
      .withColumn("weight_scale_down", col("weight") * 0.9)
    val shifts = Shift.Nominal +: Shift.pair("scale", "weight")
    shifts.map { sh =>
      sh(ord)
        .groupBy(ax.binId(col("o_totalprice")).as("price_bin"))
        .agg(dsum(col("weight").cast("decimal(18,4)")).as("sumw"))
        .select(lit(sh.name).as("shift"), col("price_bin"), col("sumw"))
    }.reduce(_ unionByName _).orderBy("shift", "price_bin")
  }

  /** ML fold split via the engine-portable deterministic seed
    * (reference fold split `seed % folds`: columnflow/tasks/ml.py:221;
    * seeds columnflow/production/cms/seeds.py:26-190). */
  val q49 = QueryDef(
    "q49_fold_split",
    oracle = Some(s"""
      SELECT CAST(${Seeds.foldSql(5, "CAST(o_orderkey AS STRING)")} AS INT) AS fold,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY 1
      ORDER BY fold""")) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .groupBy(Seeds.fold(5, col("o_orderkey").cast("string")).as("fold"))
      .agg(count(lit(1)).as("n"), dsum(money(col("o_totalprice"))).as("sum_price"))
      .orderBy("fold")
  }

  /** Intra-collection index walk — the gen-ancestry shape `arr[el.motherIdx]`
    * (reference gen_particles lookups:
    * columnflow/production/cms/gen_particles.py:26-374): each item's
    * "mother" is the previous element; per event, Σ|price−mother.price|. */
  val q50 = QueryDef(
    "q50_index_walk",
    oracle = Some("""
      WITH idx AS (
        SELECT l_orderkey, l_extendedprice,
          ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY
            l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag) AS rn
        FROM lineitem)
      SELECT a.l_orderkey AS o_orderkey,
        CAST(SUM(CAST(ROUND(ABS(a.l_extendedprice - m.l_extendedprice), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_dp
      FROM idx a JOIN idx m
        ON a.l_orderkey = m.l_orderkey AND m.rn = a.rn - 1
      GROUP BY 1
      ORDER BY o_orderkey""")) { (s, dir) =>
    val ev = nestedOrders(s, dir).filter(size(col("items")) >= 2)
    val items = col("items")
    val diffs = transform(items, (x, i) =>
      when(i > 0, round(abs(x.getField("l_extendedprice") -
        element_at(items, i).getField("l_extendedprice")), 6)))
    ev.select(
      col("o_orderkey"),
      aggregate(filter(diffs, d => d.isNotNull), lit(0).cast("decimal(28,6)"),
        (acc, d) => (acc + d.cast("decimal(18,6)")).cast("decimal(28,6)"))
        .cast("double").as("sum_dp"))
      .orderBy("o_orderkey")
  }

  /** Working-point-method tagger weight (reference btag_wp_weights,
    * columnflow/production/cms/btag.py:414-660): P(data)/P(MC) with
    * per-object efficiency ε and scale factor SF —
    *
    *   w = Π_tagged SF · Π_untagged (1 − SF·ε)/(1 − ε)
    *
    * "tagged" = returnflag 'R'; ε and SF are deterministic per-object
    * functions standing in for the binned payload lookups (q54/q66 prove
    * the lookup machinery separately). Accumulated in LOG space with the
    * q45 decimal-9 rounding so the per-event product is order-free. */
  val q137 = QueryDef(
    "q137_btag_wp_weight",
    oracle = Some(s"""
      WITH t AS (
        SELECT l_orderkey,
          l_returnflag = 'R' AS tagged,
          0.2 + l_quantity / 100 AS eff,
          1 + l_discount / 2 AS sf
        FROM lineitem)
      SELECT l_orderkey AS o_orderkey,
        CAST(SUM(CAST(${Compat.roundSql(
          "CASE WHEN tagged THEN ln(sf) ELSE ln((1 - sf * eff) / (1 - eff)) END", 9)}
          AS DECIMAL(18,9))) AS DOUBLE) AS sum_log_w,
        CAST(SUM(CASE WHEN tagged THEN 1 ELSE 0 END) AS BIGINT) AS n_tagged,
        COUNT(*) AS n_items
      FROM t GROUP BY 1
      ORDER BY o_orderkey""")) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_orderkey"),
      (col("l_returnflag") === "R").as("tagged"),
      (lit(0.2) + col("l_quantity") / 100).as("eff"),
      (lit(1) + col("l_discount") / 2).as("sf"))
    li.groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(
        dsum(round(when(col("tagged"), log(col("sf")))
            .otherwise(log((lit(1) - col("sf") * col("eff")) / (lit(1) - col("eff")))), 9)
          .cast("decimal(18,9)")).as("sum_log_w"),
        sum(when(col("tagged"), 1L).otherwise(0L)).as("n_tagged"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderkey")
  }

  /** Rebin consistency under oracle: fill at 40 bins, `HistTable.rebin`
    * by 4 — the oracle fills the 10-bin axis DIRECTLY, so the hash match
    * proves rebin ≡ refill including the flow rows (overflow remapped to
    * the coarse id). The reference's equal-width rebin is a bin-table
    * transform with exactly this law (plot_util.py:1040-1086). */
  val q138 = QueryDef(
    "q138_rebin",
    oracle = Some {
      val coarse = graft.hist.Axis.Regular("price", 10, 0.0, 400000.0)
      s"""
      SELECT ${coarse.binIdSql("o_totalprice")} AS price_bin,
        CAST(SUM(CAST(1.0 AS DECIMAL(18,4))) AS DOUBLE) AS sumw,
        CAST(SUM(CAST(1.0 AS DECIMAL(18,4)) * CAST(1.0 AS DECIMAL(18,4))) AS DOUBLE) AS sumw2,
        COUNT(*) AS n
      FROM orders
      GROUP BY 1
      ORDER BY price_bin"""
    }) { (s, dir) =>
    val fine = graft.hist.Axis.Regular("price", 40, 0.0, 400000.0)
    val h = graft.hist.HistTable.fill(
      Tables.load(s, dir, "orders"), Seq(fine -> col("o_totalprice")))
    graft.hist.HistTable.rebin(h, fine, 4).orderBy("price_bin")
  }
}
