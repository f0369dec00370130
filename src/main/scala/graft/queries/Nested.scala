package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Route, Tables, UpdateMerge}
import graft.ops.{Reducers, SelectionResult}
import graft.kinematics.Kinematics
import Compat._

/** Nested-event pipeline family: orders become "events" whose lineitems are
  * a ragged collection (array<struct>), mirroring the reference's
  * NanoAOD-shaped data model (SURVEY §1.1). Every query reproduces the
  * same result from the flat tables in the DuckDB oracle, so the nested
  * machinery (higher-order functions, object masks, slice routes, the
  * diff merge) is differentially tested.
  *
  * Scale note: the nested build is ONE shuffle (groupBy orderkey); all
  * per-event object operations after it are shuffle-free map work inside
  * whole-stage codegen, exactly how the engine should behave on 100 TB of
  * event data.
  */
object Nested {

  def defs: Seq[QueryDef] = Seq(q20, q21, q22, q23, q24, q25, q26)

  /** orders + sorted lineitem collection, the A1-fixture analogue. Struct
    * field order starts with l_linenumber so sort_array gives the stable
    * in-order layout the reference assumes of its collections.
    *
    * @param fields item-struct members to collect — callers must pass only
    *   what they read: the collect_list shuffle carries every field for
    *   every row, so unused fields are pure shuffle volume at scale (the
    *   reference's read-set pruning, SURVEY §4 column pruning). */
  def nestedOrders(s: SparkSession, dir: String,
                   fields: Seq[String] = Seq("l_linenumber", "l_quantity",
                     "l_extendedprice", "l_discount", "l_tax", "l_returnflag")): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val items = li.groupBy("l_orderkey").agg(
      sort_array(collect_list(struct(fields.map(col): _*))).as("items"))
    Tables.load(s, dir, "orders")
      .join(items, col("o_orderkey") === col("l_orderkey"), "left")
      .drop("l_orderkey")
      .withColumn("items", coalesce(col("items"), array()))
  }

  /** Collection counts + per-event aggregate over the ragged axis
    * (reference ak.num / ak.sum(axis=1): SURVEY §2.6). */
  val q20 = QueryDef(
    "q20_nested_counts",
    oracle = Some("""
      SELECT o_orderkey, o_orderpriority,
        COUNT(l_orderkey) AS n_items,
        COALESCE(SUM(l_quantity), 0) AS sum_qty
      FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_orderpriority
      ORDER BY o_orderkey"""),
    bench = true) { (s, dir) =>
    nestedOrders(s, dir, Seq("l_linenumber", "l_quantity")).select(
      col("o_orderkey"), col("o_orderpriority"),
      size(col("items")).cast("long").as("n_items"),
      Kinematics.scalarSum(col("items.l_quantity")).as("sum_qty"))
      .orderBy("o_orderkey")
  }

  /** The template-analysis selection slice (SURVEY §7.3): object mask +
    * count-based event cut + reduction, via Selector/SelectionResult/
    * Reducer (reference: analysis_templates/.../selection/example.py:36-37,
    * reduction columnflow/reduction/default.py:23-104). */
  val q21 = QueryDef(
    "q21_select_reduce",
    oracle = Some("""
      WITH sel AS (
        SELECT l_orderkey, l_extendedprice
        FROM lineitem WHERE l_quantity >= 30 AND l_discount <= 0.05),
      agg AS (
        SELECT l_orderkey, COUNT(*) AS n_sel,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sel_price
        FROM sel GROUP BY l_orderkey)
      SELECT o_orderkey, n_sel, sel_price
      FROM orders JOIN agg ON o_orderkey = l_orderkey
      WHERE n_sel >= 2 AND o_totalprice > 100000
      ORDER BY o_orderkey"""),
    bench = true) { (s, dir) =>
    val ev = nestedOrders(s, dir,
      Seq("l_linenumber", "l_quantity", "l_extendedprice", "l_discount"))
    // Selector: object mask over the collection + event-level steps.
    val objMask: Column => Column =
      it => it.getField("l_quantity") >= 30 && it.getField("l_discount") <= 0.05
    val selIdx = filter(
      transform(col("items"), (it, i) => struct(i.as("i"), objMask(it).as("ok"))),
      x => x.getField("ok")).getField("i")
    val result = SelectionResult(
      steps = Map(
        "two_selected" -> (size(filter(col("items"), objMask)) >= 2),
        "high_value" -> (col("o_totalprice") > 100000)),
      objects = Map("items" -> Map("sel_items" -> selIdx)))
    // Reducer: event mask + collection projection through index arrays.
    Reducers.default(ev, result)
      .select(
        col("o_orderkey"),
        size(col("sel_items")).cast("long").as("n_sel"),
        sum_money(col("sel_items.l_extendedprice")).as("sel_price"))
      .orderBy("o_orderkey")
  }

  /** Leading-object slice route with null_value sentinel
    * (reference `Jet.pt[:,0]` + EMPTY_FLOAT:
    * columnflow/columnar_util.py:203-244, tasks/histograms.py:309-312).
    * "Leading" = highest extendedprice among selected items. */
  val q22 = QueryDef(
    "q22_leading_item",
    oracle = Some("""
      WITH ranked AS (
        SELECT l_orderkey, l_extendedprice,
          ROW_NUMBER() OVER (PARTITION BY l_orderkey
            ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        FROM lineitem WHERE l_quantity >= 45)
      SELECT o_orderkey,
        COALESCE(r.l_extendedprice, -99999.0) AS lead_price
      FROM orders LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
        ON o_orderkey = r.l_orderkey
      ORDER BY o_orderkey""")) { (s, dir) =>
    val ev = nestedOrders(s, dir, Seq("l_linenumber", "l_quantity", "l_extendedprice"))
    val selected = filter(col("items"), it => it.getField("l_quantity") >= 45)
    // sort by (-price, linenumber): the reference's pt-ordered indices
    // (sorted_indices_from_mask, columnflow/columnar_util.py:1134-1161).
    val bySorted = array_sort(selected, (l, r) =>
      when(l.getField("l_extendedprice") > r.getField("l_extendedprice"), -1)
        .when(l.getField("l_extendedprice") < r.getField("l_extendedprice"), 1)
        .otherwise((l.getField("l_linenumber") - r.getField("l_linenumber")).cast("int")))
    val df = ev.withColumn("sel_sorted", bySorted)
    val leadPrice = Route("sel_sorted.l_extendedprice[0]")
      .columnOrElse(df, lit(-99999.0))
    df.select(col("o_orderkey"), leadPrice.as("lead_price")).orderBy("o_orderkey")
  }

  /** 1-D weighted histogram via the bin-table fill (reference fill_hist:
    * columnflow/hist_util.py:30-142), regular axis with flow bins and
    * last-edge-inclusive semantics. */
  val q23 = QueryDef(
    "q23_hist1d",
    oracle = Some {
      val ax = graft.hist.Axis.Regular("price", 40, 0.0, 400000.0)
      s"""
      SELECT ${ax.binIdSql("o_totalprice")} AS price_bin,
        CAST(SUM(CAST(1.0 AS DECIMAL(18,4))) AS DOUBLE) AS sumw,
        CAST(SUM(CAST(1.0 AS DECIMAL(18,4)) * CAST(1.0 AS DECIMAL(18,4))) AS DOUBLE) AS sumw2,
        COUNT(*) AS n
      FROM orders
      GROUP BY 1
      ORDER BY price_bin"""
    },
    bench = true) { (s, dir) =>
    val ax = graft.hist.Axis.Regular("price", 40, 0.0, 400000.0)
    graft.hist.HistTable.fill(
      Tables.load(s, dir, "orders"), Seq(ax -> col("o_totalprice")))
      .orderBy("price_bin")
  }

  /** 2-D histogram: regular × string-category axes, weighted by a value
    * column — the category×variable fill of CreateHistograms
    * (reference: columnflow/tasks/histograms.py:317-323). */
  val q24 = QueryDef(
    "q24_hist2d_weighted",
    oracle = Some {
      val axQ = graft.hist.Axis.Regular("qty", 10, 0.0, 50.0)
      val axP = graft.hist.Axis.StrCat("prio",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      s"""
      SELECT ${axQ.binIdSql("l_quantity")} AS qty_bin,
        ${axP.binIdSql("o_orderpriority")} AS prio_bin,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sumw,
        CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(14,4)))) AS DOUBLE) AS sumw2,
        COUNT(*) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
      ORDER BY qty_bin, prio_bin"""
    },
    bench = true) { (s, dir) =>
    val axQ = graft.hist.Axis.Regular("qty", 10, 0.0, 50.0)
    val axP = graft.hist.Axis.StrCat("prio",
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
    val joined = Tables.load(s, dir, "lineitem")
      .join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
    graft.hist.HistTable.fill(
      joined,
      Seq(axQ -> col("l_quantity"), axP -> col("o_orderpriority")),
      weight = col("l_extendedprice"), integerSumw2 = true)
      .orderBy("qty_bin", "prio_bin")
  }

  /** Cutflow: cumulative AND of selection steps, one bin per step
    * (reference CreateCutflowHistograms: columnflow/tasks/cutflow.py:33-333). */
  val q25 = QueryDef(
    "q25_cutflow",
    oracle = Some("""
      SELECT step, n FROM (
        SELECT 0 AS step, COUNT(*) AS n FROM orders
        UNION ALL
        SELECT 1, COUNT(*) FROM orders WHERE o_totalprice > 100000
        UNION ALL
        SELECT 2, COUNT(*) FROM orders WHERE o_totalprice > 100000 AND o_orderpriority IN ('1-URGENT','2-HIGH')
        UNION ALL
        SELECT 3, COUNT(*) FROM orders WHERE o_totalprice > 100000 AND o_orderpriority IN ('1-URGENT','2-HIGH') AND o_orderstatus = 'F')
      ORDER BY step""")) { (s, dir) =>
    val ord = Tables.load(s, dir, "orders")
    val steps: Seq[Column] = Seq(
      lit(true),
      col("o_totalprice") > 100000,
      col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
      col("o_orderstatus") === "F")
    // Cumulative AND, one conditional count per step — a single pass.
    val cum = steps.scanLeft(lit(true))(_ && _).tail
    val aggs = cum.zipWithIndex.map { case (m, i) =>
      sum(when(m, 1L).otherwise(0L)).as(s"step_$i")
    }
    val row = ord.agg(aggs.head, aggs.tail: _*)
    // unpivot to (step, n)
    val stacked = cum.indices.map(i =>
      row.select(lit(i).as("step"), col(s"step_$i").as("n")))
    stacked.reduce(_ unionByName _).orderBy("step")
  }

  /** Nearest-neighbour match within the event — the ΔR match shape
    * (reference delta_r_match: columnflow/production/util.py:124-167):
    * for every item, the closest other item of the same order by price
    * metric; per order, the minimum and the matched-pair count. Pure
    * intra-row O(n²) with n = items/order — no shuffle beyond the build. */
  val q26 = QueryDef(
    "q26_nn_match",
    oracle = Some("""
      WITH idx AS (
        SELECT l_orderkey, l_extendedprice,
          ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY
            l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag) AS rn
        FROM lineitem),
      pairs AS (
        SELECT a.l_orderkey, a.rn,
          MIN(ABS(a.l_extendedprice - b.l_extendedprice)) AS min_d
        FROM idx a JOIN idx b
          ON a.l_orderkey = b.l_orderkey AND a.rn <> b.rn
        GROUP BY a.l_orderkey, a.rn)
      SELECT l_orderkey AS o_orderkey,
        COUNT(*) AS n_matched,
        MIN(min_d) AS best_d
      FROM pairs
      GROUP BY l_orderkey
      ORDER BY o_orderkey""")) { (s, dir) =>
    val ev = nestedOrders(s, dir, Seq("l_extendedprice"))
      .filter(size(col("items")) >= 2)
    // Identity is the array position, not l_linenumber (which is NOT unique
    // per order in the testdata) — mirrors ak.local_index
    // (reference: columnflow/production/util.py:159).
    val indexed = transform(col("items"), (x, i) =>
      struct(i.as("i"), x.getField("l_extendedprice").as("p")))
    val dists = transform(indexed, a =>
      array_min(transform(
        filter(indexed, b => b.getField("i") =!= a.getField("i")),
        b => abs(a.getField("p") - b.getField("p")))))
    ev.select(col("o_orderkey"), dists.as("dists"))
      .select(
        col("o_orderkey"),
        size(col("dists")).cast("long").as("n_matched"),
        array_min(col("dists")).as("best_d"))
      .orderBy("o_orderkey")
  }

  /** Exact decimal sum over an array column (helper for q21). */
  private def sum_money(arr: Column): Column =
    aggregate(arr, lit(0).cast("decimal(28,4)"),
      (acc, x) => (acc + x.cast("decimal(18,4)")).cast("decimal(28,4)")).cast("double")
}
