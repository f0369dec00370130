package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import graft.stats.Stitching
import Compat._

/** Weight-systematics producers from the reference catalog (SURVEY §2.11):
  * PDF member envelopes, LHE scale (murmuf) envelopes, top-pt-style
  * exponential reweighting, and the dataset-stitching normalization solve
  * (SURVEY hard part #4). `items`/line items play per-event weight members;
  * order-level columns play event-level quantities.
  */
object Weights {

  def defs: Seq[QueryDef] = Seq(q61, q62, q63, q64, q68)

  /** Recomputed id bitmask (reference jet_id: columnflow/production/cms/
    * jet.py:55-185 — per-object quality bits rebuilt from kinematic
    * predicates, then bit-tested downstream): three predicate bits per
    * item, OR-composed with shifts, tested with bitwise AND. Integer
    * arithmetic throughout — exact on both engines. */
  val q68 = QueryDef(
    "q68_id_bitmask",
    oracle = Some("""
      SELECT l_orderkey AS o_orderkey,
        CAST(SUM(CAST(
          (CASE WHEN l_quantity > 10 THEN 1 ELSE 0 END)
          + (CASE WHEN l_extendedprice > 10000 THEN 2 ELSE 0 END)
          + (CASE WHEN l_discount < 0.05 THEN 4 ELSE 0 END) AS BIGINT)) AS BIGINT) AS sum_mask,
        CAST(SUM(CASE WHEN l_quantity > 10 AND l_discount < 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_tight
      FROM lineitem
      GROUP BY 1
      ORDER BY o_orderkey""")) { (s, dir) =>
    val bit0 = when(col("l_quantity") > 10, 1).otherwise(0)
    val bit1 = when(col("l_extendedprice") > 10000, 1).otherwise(0)
    val bit2 = when(col("l_discount") < 0.05, 1).otherwise(0)
    val mask = bit0
      .bitwiseOR(shiftleft(bit1, 1))
      .bitwiseOR(shiftleft(bit2, 2))
    // tight = bits 0 AND 2 both set, tested on the recomputed mask
    val tight = (mask.bitwiseAND(lit(5)) === 5).cast("int")
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(
        sum(mask.cast("long")).as("sum_mask"),
        sum(tight).cast("long").as("n_tight"))
      .orderBy("o_orderkey")
  }

  import Nested.nestedOrders

  /** PDF member envelope (reference pdf_weights:
    * columnflow/production/cms/pdf.py:53-260): nominal = member 0, σ from
    * the central-68% spread of the sorted members — here the members are an
    * order's item prices, nominal the first line. Pure intra-event array
    * work: sort + indexed element, no shuffle beyond the event build. */
  val q61 = QueryDef(
    "q61_pdf_envelope",
    oracle = Some("""
      WITH m AS (
        SELECT l_orderkey,
          list_sort(list(l_extendedprice)) AS arr,
          list(l_extendedprice ORDER BY l_linenumber, l_extendedprice)[1] AS nominal,
          COUNT(*) AS n
        FROM lineitem GROUP BY 1)
      SELECT l_orderkey AS o_orderkey, n, nominal,
        list_extract(arr, CAST(GREATEST(1, CEIL(0.16 * n)) AS INT)) AS member_down,
        list_extract(arr, CAST(GREATEST(1, CEIL(0.84 * n)) AS INT)) AS member_up,
        (list_extract(arr, CAST(GREATEST(1, CEIL(0.84 * n)) AS INT)) -
         list_extract(arr, CAST(GREATEST(1, CEIL(0.16 * n)) AS INT))) / 2 AS sigma
      FROM m ORDER BY o_orderkey""")) { (s, dir) =>
    val ev = nestedOrders(s, dir, Seq("l_linenumber", "l_extendedprice"))
      .filter(size(col("items")) > 0)
    val arr = array_sort(col("items.l_extendedprice"))
    val n = size(col("items"))
    def idx(q: Double): Column = greatest(lit(1), ceil(lit(q) * n)).cast("int")
    val up = element_at(arr, idx(0.84))
    val down = element_at(arr, idx(0.16))
    ev.select(
      col("o_orderkey"),
      n.cast("long").as("n"),
      element_at(col("items"), 1).getField("l_extendedprice").as("nominal"),
      down.as("member_down"),
      up.as("member_up"),
      ((up - down) / 2).as("sigma"))
      .orderBy("o_orderkey")
  }

  /** LHE scale-weight envelope (reference murmuf_envelope_weights:
    * columnflow/production/cms/scale.py:193-280 — max/min across the
    * variation members per event): 7 tax-scaled price sums per order,
    * envelope = greatest/least, nominal = the unscaled member. Exact
    * decimal member sums make the envelope order-independent. */
  val q62 = QueryDef(
    "q62_scale_envelope",
    oracle = Some {
      val fs = Seq(-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0)
      val members = fs.zipWithIndex.map { case (f, i) =>
        s"SUM(CAST(l_extendedprice * (1 + $f * l_tax) AS DECIMAL(18,6))) AS s${i + 1}"
      }.mkString(", ")
      val names = (1 to fs.length).map(i => s"s$i").mkString(", ")
      s"""
      SELECT l_orderkey AS o_orderkey,
        CAST(GREATEST($names) AS DOUBLE) AS env_up,
        CAST(LEAST($names) AS DOUBLE) AS env_down,
        CAST(s4 AS DOUBLE) AS nominal
      FROM (SELECT l_orderkey, $members FROM lineitem GROUP BY 1)
      ORDER BY o_orderkey"""
    },
    bench = true) { (s, dir) =>
    val fs = Seq(-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0)
    // Exact-sum members at codegen speed: the per-row DECIMAL(18,6) cast
    // fixes the oracle's rounding, then the value is carried as its
    // UNSCALED long (×1e6) so the 7 sums stay long additions inside
    // whole-stage codegen instead of Decimal(28,6) box arithmetic
    // (measured 2.3× on the agg alone). Safe: per-group sums are bounded
    // by order size (≤7 items × ~1e11 unscaled ≪ 2^63), and the final
    // long→double/1e6 is correctly rounded because the unscaled value
    // < 2^53 (SCALE.md).
    val members = fs.zipWithIndex.map { case (f, i) =>
      sum(((col("l_extendedprice") * (lit(1) + lit(f) * col("l_tax")))
        .cast(DecimalType(18, 6)) * lit(1000000)).cast("long")).as(s"u${i + 1}")
    }
    val names = (1 to fs.length).map(i => col(s"u$i"))
    // One shuffle total: range-partitioning the scan by the group key
    // satisfies BOTH the aggregation's clustering requirement AND the
    // final sort's ordering (alias-aware through the groupBy rename), so
    // the aggregate runs once (no range-sampling re-execution — the r2
    // regression) and the orderBy is partition-local. 4.15 s → 0.66 s
    // at sf0.1.
    Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_tax")
      .repartitionByRange(col("l_orderkey"))
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(members.head, members.tail: _*)
      .select(
        col("o_orderkey"),
        (greatest(names: _*).cast("double") / 1e6).as("env_up"),
        (least(names: _*).cast("double") / 1e6).as("env_down"),
        (col("u4").cast("double") / 1e6).as("nominal"))
      .orderBy("o_orderkey")
  }

  /** Top-pt-style reweighting (reference top_pt_weight:
    * columnflow/production/cms/top_pt_weight.py:60-180 —
    * w = √(sf(pt1)·sf(pt2)), sf(pt) = exp(a − b·min(pt, cap))): the two
    * "tops" are an order's max/min item price (scaled), capped at 500.
    * libm exp is rounded to 1e-6 before the exact decimal sum. */
  val q63 = QueryDef(
    "q63_top_pt_weight",
    oracle = Some("""
      WITH tops AS (
        SELECT l_orderkey,
          LEAST(MAX(l_extendedprice) / 100, 500.0) AS pt1,
          LEAST(MIN(l_extendedprice) / 100, 500.0) AS pt2
        FROM lineitem GROUP BY 1 HAVING COUNT(*) >= 2)
      SELECT o_orderpriority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(ROUND(SQRT(EXP(0.0615 - 0.0005 * pt1) * EXP(0.0615 - 0.0005 * pt2)), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_w
      FROM tops JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1
      ORDER BY o_orderpriority""")) { (s, dir) =>
    val tops = Tables.load(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(
        least(max(col("l_extendedprice")) / 100, lit(500.0)).as("pt1"),
        least(min(col("l_extendedprice")) / 100, lit(500.0)).as("pt2"),
        count(lit(1)).as("__n"))
      .filter(col("__n") >= 2)
    def sf(pt: Column): Column = exp(lit(0.0615) - lit(0.0005) * pt)
    val w = round(sqrt(sf(col("pt1")) * sf(col("pt2"))), 6)
    Tables.load(s, dir, "orders")
      .join(tops, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(w.cast(DecimalType(18, 6))).as("sum_w"))
      .orderBy("o_orderpriority")
  }

  /** Dataset stitching (reference: columnflow/production/normalization.py
    * :73-270, SURVEY hard part #4): branching ratios per leaf process from
    * the inclusive dataset's stats, per-leaf effective Σw over all datasets
    * covering the leaf, normalization = xsec·br/Σw_eff. The distributed
    * part is one decimal-exact stats groupBy; the O(#processes) solve runs
    * on the driver (`stats/Stitching`) and re-enters the plan as a literal
    * map — the same broadcast-LUT shape the reference uses. Here leaves =
    * order priorities; an "exclusive" dataset covers only the URGENT leaf. */
  val q64 = QueryDef(
    "q64_stitching",
    // exactDoubleSql, not a bare decimal→double cast: orders' price sum
    // passes unscaled 2^53 at sf10 (2.3e16), where DuckDB's direct cast
    // double-rounds while Scala's BigDecimal.toDouble (the driver-side
    // solve) is correctly rounded — the br/norm ratios then differ at the
    // last ulp (caught by the round-8 sf10 full sweep)
    oracle = Some(s"""
      WITH s AS (
        SELECT o_orderpriority,
          ${Compat.exactDoubleSql("SUM(CAST(o_totalprice AS DECIMAL(18,4)))")} AS sumw
        FROM orders GROUP BY 1),
      t AS (
        SELECT ${Compat.exactDoubleSql("SUM(CAST(o_totalprice AS DECIMAL(18,4)))")} AS total
        FROM orders)
      SELECT o_orderpriority, sumw,
        sumw / total AS br,
        CASE WHEN o_orderpriority = '1-URGENT' THEN sumw * 2 ELSE sumw END AS sumw_eff,
        1000.0 * (sumw / total) /
          (CASE WHEN o_orderpriority = '1-URGENT' THEN sumw * 2 ELSE sumw END) AS norm_weight
      FROM s, t ORDER BY o_orderpriority""")) { (s, dir) =>
    val stats = Tables.load(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(sum(money(col("o_totalprice"))).as("sumw_dec"))
    // driver-side solve on the tiny per-process stats, like the reference
    val leafSumw = stats.collect()
      .map(r => r.getString(0) -> BigDecimal(r.getDecimal(1))).toMap
    val root = Stitching.Proc("ALL", leafSumw.keys.toSeq.sorted.map(Stitching.Proc(_)))
    val br = Stitching.branchingRatios(root, leafSumw)
    val eff = Stitching.combinedSumw(Seq(
      leafSumw,                                // inclusive covers all leaves
      leafSumw.filter(_._1 == "1-URGENT")))    // exclusive covers one leaf
    def lut(m: Map[String, Double]): Column = element_at(
      map(m.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
      col("o_orderpriority"))
    val brCol = lut(br)
    val effCol = lut(eff.map { case (k, v) => k -> v.toDouble })
    stats.select(
      col("o_orderpriority"),
      col("sumw_dec").cast("double").as("sumw"),
      brCol.as("br"),
      effCol.as("sumw_eff"),
      (lit(1000.0) * brCol / effCol).as("norm_weight"))
      .orderBy("o_orderpriority")
  }
}
