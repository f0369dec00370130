package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Seeds
import graft.operators.{Curation, Eval, Graph, Timeseries}

/** Evaluation / sequence / graph analytics family: rank-based AUC,
  * Pareto frontier, equi-depth binning, EWMA, Markov transitions,
  * triangle counting, robust outliers, and deterministic per-group
  * sampling. Each query pins one operator from `operators/{Eval,
  * Timeseries, Graph, Curation}` against a DuckDB oracle.
  */
object Analytics {

  def defs: Seq[QueryDef] = Seq(q128, q129, q130, q131, q132, q133, q134, q135, q144,
    q157, q158, q163, q176, q191, q200)

  /** Per-fold ROC AUC of a toy scorer (first embedding coordinate) for
    * the odd-label class — the distributed model-eval primitive
    * (`Eval.aucByGroup`, Mann–Whitney rank form). Folds come from the
    * portable md5 fold split (q49), so train/eval assignment is
    * engine-reproducible. All rank sums are half-integers: exact. */
  val q128 = QueryDef(
    "q128_auc",
    oracle = Some(s"""
      WITH t AS (
        SELECT ${Seeds.foldSql(4, "CAST(vec_id AS VARCHAR)")} AS fold,
               CAST(embedding[1] AS DOUBLE) AS score,
               CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS pos
        FROM embeddings),
      r AS (
        SELECT fold, pos,
          RANK() OVER (PARTITION BY fold ORDER BY score)
            + (COUNT(*) OVER (PARTITION BY fold, score) - 1) / 2.0 AS avg_rank
        FROM t)
      SELECT fold,
        CAST(SUM(pos) AS BIGINT) AS n_pos,
        CAST(SUM(1 - pos) AS BIGINT) AS n_neg,
        (SUM(CASE WHEN pos = 1 THEN avg_rank ELSE 0 END)
           - SUM(pos) * (SUM(pos) + 1) / 2.0)
          / (SUM(pos) * SUM(1 - pos)) AS auc
      FROM r GROUP BY fold ORDER BY fold""")) { (s, dir) =>
    val emb = Tables.load(s, dir, "embeddings").select(
      Seeds.foldFromExpr(4, "CAST(vec_id AS STRING)").as("fold"),
      element_at(col("embedding"), 1).cast("double").as("score"),
      (col("label") % 2).cast("int").as("pos"))
    Eval.aucByGroup(emb, "fold", "score", "pos")
      .select(col("fold"), col("n_pos"), col("n_neg"), col("auc"))
      .orderBy("fold")
  }

  /** Pareto frontier of parts (minimize price, maximize size): the
    * sort+running-max skyline (`Eval.skyline2D`) vs the oracle's
    * quadratic NOT-EXISTS definition — same set, O(n log n) vs O(n²). */
  val q129 = QueryDef(
    "q129_skyline",
    oracle = Some("""
      WITH p AS (SELECT p_retailprice AS cost, p_size AS gain,
                   CAST(COUNT(*) AS BIGINT) AS n_points
                 FROM part GROUP BY 1, 2)
      SELECT cost, gain, n_points FROM p t
      WHERE NOT EXISTS (
        SELECT 1 FROM p u
        WHERE u.cost <= t.cost AND u.gain >= t.gain
          AND (u.cost < t.cost OR u.gain > t.gain))
      ORDER BY cost""")) { (s, dir) =>
    val pts = Tables.load(s, dir, "part")
      .select(col("p_retailprice").as("cost"), col("p_size").as("gain"))
    Eval.skyline2D(pts, "cost", "gain").orderBy("cost")
  }

  /** Equi-depth decile binning of event values (NTILE over a total
    * order) with per-bin count/min/max/exact-decimal mean — the
    * feature-discretization / reliability-diagram primitive. */
  val q130 = QueryDef(
    "q130_quantile_bins",
    oracle = Some("""
      WITH t AS (SELECT value, event_id FROM events WHERE value IS NOT NULL),
      b AS (SELECT value,
              CAST(NTILE(10) OVER (ORDER BY value, event_id) AS INT) AS bin
            FROM t)
      SELECT bin, COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS mean
      FROM b GROUP BY bin ORDER BY bin""")) { (s, dir) =>
    val ev = Tables.load(s, dir, "events").filter(col("value").isNotNull)
    Eval.equiDepthBins(ev, 10, col("value"),
        Compat.money(col("value")), col("event_id"))
      .orderBy("bin")
  }

  /** Truncated EWMA (decay 1/2, depth 8) of event values per user —
    * `Timeseries.ewmaHalf`. Powers of two make every weight product an
    * exact scaling; both engines reduce the frame list left-to-right, so
    * the doubles are bit-identical (see Timeseries scaladoc). */
  val q131 = QueryDef(
    "q131_ewma",
    oracle = Some("""
      WITH t AS (SELECT user_id, event_id, ts, value
                 FROM events WHERE value IS NOT NULL),
      f AS (SELECT user_id, event_id, value,
              list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS fr
            FROM t)
      SELECT user_id, event_id, value,
        list_reduce(list_transform(fr, (x, i) -> x * 0.5 ^ (len(fr) - i)),
                    (a, b) -> a + b)
        / list_reduce(list_transform(fr, (x, i) -> 0.5 ^ (len(fr) - i)),
                      (a, b) -> a + b) AS ewma
      FROM f ORDER BY user_id, event_id""")) { (s, dir) =>
    val ev = Tables.load(s, dir, "events").filter(col("value").isNotNull)
    Timeseries.ewmaHalf(ev, "user_id", "value",
        Seq(col("ts"), col("event_id")), depth = 8)
      .select(col("user_id"), col("event_id"), col("value"), col("ewma"))
      .orderBy("user_id", "event_id")
  }

  /** First-order Markov transition matrix of user event sequences —
    * `Timeseries.transitions`: (from, to) counts and exact-ratio
    * probabilities over ts-ordered per-user event streams. */
  val q132 = QueryDef(
    "q132_markov",
    oracle = Some("""
      WITH a AS (SELECT user_id, event_type,
                   LEAD(event_type) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS nxt
                 FROM events),
      c AS (SELECT event_type AS from_state, nxt AS to_state,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM a WHERE nxt IS NOT NULL GROUP BY 1, 2)
      SELECT from_state, to_state, n,
        CAST(n AS DOUBLE)
          / CAST(SUM(n) OVER (PARTITION BY from_state) AS DOUBLE) AS p
      FROM c ORDER BY from_state, to_state""")) { (s, dir) =>
    Timeseries.transitions(Tables.load(s, dir, "events"),
        "user_id", "event_type", Seq(col("ts"), col("event_id")))
      .select(col("from_state"), col("to_state"), col("n"), col("p"))
      .orderBy("from_state", "to_state")
  }

  /** Triangle count of the part co-order graph (parts appearing in the
    * same order are adjacent) — `Graph.triangleCount`, wedge-closing
    * joins under the a<b<c orientation. Exact long counts. */
  val q133 = QueryDef(
    "q133_triangles",
    oracle = Some("""
      WITH e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                 FROM lineitem a JOIN lineitem b
                   ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey)
      SELECT (SELECT COUNT(*) FROM e) AS n_edges,
             (SELECT COUNT(*) FROM e ab
                JOIN e bc ON ab.b = bc.a
                JOIN e ac ON ac.a = ab.a AND ac.b = bc.b) AS n_triangles""")) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val a = li.select(col("l_orderkey").as("k"), col("l_partkey").as("a"))
    val b = li.select(col("l_orderkey").as("k"), col("l_partkey").as("b"))
    val edges = a.join(b, "k").filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    Graph.triangleCount(edges)
  }

  /** Local clustering coefficients (`Graph.clusteringCoefficient`) of the
    * q133 co-order part graph: per-vertex triangles via the same
    * degree-ordered enumeration, coefficient = 2T/(d(d−1)) — exact
    * integer ratios in doubles. The oracle enumerates triangles with the
    * a<b<c 3-join and credits all three roles. */
  val q191 = QueryDef(
    "q191_clustering_coeff",
    oracle = Some("""
      WITH e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                 FROM lineitem a JOIN lineitem b
                   ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey),
      t AS (SELECT ab.a AS x, ab.b AS y, bc.b AS z
            FROM e ab JOIN e bc ON ab.b = bc.a
              JOIN e ac ON ac.a = ab.a AND ac.b = bc.b),
      tv AS (SELECT v, COUNT(*) AS nt
             FROM (SELECT x AS v FROM t UNION ALL
                   SELECT y FROM t UNION ALL
                   SELECT z FROM t)
             GROUP BY 1),
      deg AS (SELECT v, COUNT(*) AS d
              FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
              GROUP BY 1)
      SELECT deg.v AS id, CAST(d AS BIGINT) AS degree,
        CAST(COALESCE(nt, 0) AS BIGINT) AS n_triangles,
        CASE WHEN d >= 2
             THEN CAST(COALESCE(nt, 0) * 2 AS DOUBLE) / CAST(d * (d - 1) AS DOUBLE)
             ELSE CAST(0 AS DOUBLE) END AS coefficient
      FROM deg LEFT JOIN tv USING (v)
      ORDER BY id""")) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val a = li.select(col("l_orderkey").as("k"), col("l_partkey").as("a"))
    val b = li.select(col("l_orderkey").as("k"), col("l_partkey").as("b"))
    val edges = a.join(b, "k").filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    Graph.clusteringCoefficient(edges).orderBy("id")
  }

  /** Wedge-sampling clustering-coefficient estimate
    * (`Graph.clusteringCoefficientSampled`, k=16, portable md5 draws) of
    * the q133/q191 co-order part graph — the corpus-scale dial where the
    * exact wedge shuffle outgrows disk (q191's sf10 note). The oracle
    * re-derives the SAME deterministic samples (md5-lower-64 slot
    * hashes, min/max draw = a uniform wedge) and their closure — the
    * hash match pins sampling, draw order, tie-breaks, and the estimate
    * arithmetic bit-for-bit. `GraphSpec` pins the statistics (unbiased
    * vs exact on random graphs, exact 1.0/0.0 on cliques/stars). */
  val q200 = QueryDef(
    "q200_clustering_sampled",
    oracle = Some {
      val h = graft.operators.Sketches.signed64FromHexSql(
        "md5('ws|' || CAST(v AS VARCHAR) || '|' || CAST(s AS VARCHAR) || '|' || CAST(u AS VARCHAR))")
      s"""
      WITH e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                 FROM lineitem a JOIN lineitem b
                   ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey),
      sym AS (SELECT a AS v, b AS u FROM e UNION SELECT b, a FROM e),
      deg AS (SELECT v, COUNT(*) AS d FROM sym GROUP BY 1),
      h AS (SELECT v, u, s, $h AS hv
            FROM sym, unnest(generate_series(1, 16)) AS t(s)),
      draws AS (SELECT v, s, COUNT(*) AS d,
                  (list(u ORDER BY hv ASC, u ASC))[1] AS u1,
                  (list(u ORDER BY hv DESC, u DESC))[1] AS u2
                FROM h GROUP BY 1, 2),
      cl AS (SELECT v, LEAST(u1, u2) AS x, GREATEST(u1, u2) AS y
             FROM draws WHERE d >= 2),
      agg AS (SELECT cl.v, CAST(COUNT(*) AS BIGINT) AS sampled,
                CAST(SUM(CASE WHEN e.a IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS closed
              FROM cl LEFT JOIN e ON e.a = cl.x AND e.b = cl.y
              GROUP BY 1)
      SELECT deg.v AS id, CAST(d AS BIGINT) AS degree,
        COALESCE(sampled, 0) AS sampled, COALESCE(closed, 0) AS closed,
        CASE WHEN d >= 2
             THEN CAST(COALESCE(closed, 0) AS DOUBLE) / CAST(COALESCE(sampled, 1) AS DOUBLE)
             ELSE CAST(0 AS DOUBLE) END AS coefficient_est
      FROM deg LEFT JOIN agg ON agg.v = deg.v
      ORDER BY id"""
    }) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val a = li.select(col("l_orderkey").as("k"), col("l_partkey").as("a"))
    val b = li.select(col("l_orderkey").as("k"), col("l_partkey").as("b"))
    val edges = a.join(b, "k").filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    Graph.clusteringCoefficientSampled(edges, samplesPerVertex = 16,
        portable = true)
      .orderBy("id")
  }

  /** Synchronous label propagation (`Graph.labelPropagation`, 3 rounds)
    * over the q133 co-order part graph. The oracle unrolls the exact
    * update — per-neighbor label counts, argmax with the smallest-label
    * tie-break (`list(lbl ORDER BY cnt DESC, lbl)[1]`), isolated-node
    * carry — for the same 3 synchronous rounds, so the hash match pins
    * the deterministic tie-break and schedule, not just the clustering.
    * The Spark argmax is `max(struct(cnt, -lbl))` — map-side combinable,
    * never a per-node window. */
  val q176 = QueryDef(
    "q176_label_propagation",
    oracle = Some {
      def step(i: Int) = s""",
      c$i AS (SELECT sym.d AS id, l${i - 1}.lbl, COUNT(*) AS cnt
              FROM sym JOIN l${i - 1} ON l${i - 1}.id = sym.s GROUP BY 1, 2),
      p$i AS (SELECT id, (list(lbl ORDER BY cnt DESC, lbl ASC))[1] AS lbl
              FROM c$i GROUP BY id),
      l$i AS (SELECT n.id, COALESCE(p$i.lbl, l${i - 1}.lbl) AS lbl
              FROM n LEFT JOIN p$i USING (id) JOIN l${i - 1} USING (id))"""
      s"""
      WITH e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                  FROM lineitem a JOIN lineitem b
                    ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey),
      sym AS (SELECT a AS s, b AS d FROM e0 UNION SELECT b, a FROM e0),
      n AS (SELECT DISTINCT s AS id FROM sym),
      l0 AS (SELECT id, id AS lbl FROM n)${(1 to 3).map(step).mkString}
      SELECT id, lbl AS community FROM l3 ORDER BY id"""
    }) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val a = li.select(col("l_orderkey").as("k"), col("l_partkey").as("a"))
    val b = li.select(col("l_orderkey").as("k"), col("l_partkey").as("b"))
    val edges = a.join(b, "k").filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    graft.operators.Graph.labelPropagation(edges, iterations = 3).orderBy("id")
  }

  /** Robust per-source length outliers: median + MAD on `n_chars`, count
    * of |x − med| > 3·MAD — `Eval.madOutliers`. Exact interpolated
    * medians of integers (half/quarter-integers) keep every comparison
    * exact across engines. */
  val q134 = QueryDef(
    "q134_mad_outliers",
    oracle = Some("""
      WITH med AS (SELECT source, median(n_chars) AS med
                   FROM documents GROUP BY 1),
      d AS (SELECT documents.source, med,
              ABS(n_chars - med) AS adev
            FROM documents JOIN med USING (source)),
      mad AS (SELECT source, median(adev) AS mad FROM d GROUP BY 1)
      SELECT d.source, d.med, mad.mad, COUNT(*) AS n,
        CAST(SUM(CASE WHEN d.adev > mad.mad * 3 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers
      FROM d JOIN mad ON d.source = mad.source
      GROUP BY 1, 2, 3 ORDER BY 1""")) { (s, dir) =>
    Eval.madOutliers(Tables.load(s, dir, "documents"), "source", "n_chars")
      .select(col("source"), col("med"), col("mad"), col("n"),
        col("n_outliers"))
      .orderBy("source")
  }

  /** Deterministic uniform 5-per-source document sample via md5 hash
    * rank — `Curation.uniformSamplePerGroup`: the reservoir-sample
    * result without order dependence (retry/engine/partitioning-proof). */
  val q135 = QueryDef(
    "q135_reservoir",
    oracle = Some("""
      SELECT source, doc_id, CAST(rn AS BIGINT) AS sample_rank FROM (
        SELECT source, doc_id,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents) t
      WHERE rn <= 5 ORDER BY source, sample_rank""")) { (s, dir) =>
    Curation.uniformSamplePerGroup(
        Tables.load(s, dir, "documents"), 5, "source")
      .select(col("source"), col("doc_id"), col("sample_rank"))
      .orderBy("source", "sample_rank")
  }

  /** Winsorization (`Eval.winsorize`): prices clipped to their per-flag
    * exact [P05, P95]; the summary proves the clip — clip counts are
    * exact longs, the clipped sum aggregates through DECIMAL(18,4)
    * (bounds round to the 4-decimal grid first so boundary values cast
    * without a second rounding). */
  val q163 = QueryDef(
    "q163_winsorize",
    oracle = Some("""
      WITH b AS (
        SELECT l_returnflag,
          ROUND(quantile_cont(l_extendedprice, 0.05), 4) AS lo,
          ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS hi
        FROM lineitem GROUP BY 1)
      SELECT l.l_returnflag, COUNT(*) AS n,
        CAST(SUM(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
          THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        CAST(SUM(CAST(LEAST(GREATEST(l_extendedprice, lo), hi)
          AS DECIMAL(18,4))) AS DOUBLE) AS sum_clipped
      FROM lineitem l JOIN b USING (l_returnflag)
      GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
    import graft.operators.Eval
    Eval.winsorize(Tables.load(s, dir, "lineitem"), "l_returnflag",
        col("l_extendedprice"), pLo = 0.05, pHi = 0.95)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when(col("was_clipped"), 1L).otherwise(0L)).as("n_clipped"),
        sum(col("clipped").cast("decimal(18,4)")).cast("double").as("sum_clipped"))
      .orderBy("l_returnflag")
  }

  /** Gains/lift table (`Eval.liftTable`): embeddings ranked by the toy
    * scorer (first coordinate, q128's setup), decile-split, with the
    * cumulative positive-capture rate and lift per decile — the triage
    * curve companion to AUC. Capture and lift are single divisions of
    * exact counts; (score, vec_id) totally orders the ranking so ntile
    * is deterministic. */
  val q158 = QueryDef(
    "q158_lift_table",
    oracle = Some("""
      WITH t AS (
        SELECT CAST(embedding[1] AS DOUBLE) AS s, vec_id,
          CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS y
        FROM embeddings),
      r AS (
        SELECT y, NTILE(10) OVER (ORDER BY s DESC, vec_id) AS bucket FROM t),
      per AS (
        SELECT bucket, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos
        FROM r GROUP BY 1),
      c AS (
        SELECT bucket, n, n_pos,
          CAST(SUM(n_pos) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
          CAST(SUM(n_pos) OVER () AS BIGINT) AS total_pos,
          CAST(SUM(n) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
          CAST(SUM(n) OVER () AS BIGINT) AS total_n
        FROM per)
      SELECT bucket, n, n_pos, cum_pos,
        CAST(cum_pos AS DOUBLE) / total_pos AS capture,
        CAST(cum_n AS DOUBLE) / total_n AS depth,
        (CAST(cum_pos AS DOUBLE) / total_pos)
          / (CAST(cum_n AS DOUBLE) / total_n) AS lift
      FROM c ORDER BY bucket""")) { (s, dir) =>
    import graft.operators.Eval
    Eval.liftTable(
        Tables.load(s, dir, "embeddings"),
        element_at(col("embedding"), 1).cast("double"),
        pmod(col("label"), lit(2)) === 1,
        col("vec_id"), buckets = 10)
      .orderBy("bucket")
  }

  /** Exact weighted median (`Eval.weightedMedian`): the revenue-weighted
    * median quantity per return flag — "half the REVENUE ships in
    * quantities ≤ this", which the unweighted median (q59/q134 family)
    * cannot say. All arithmetic is exact decimal (the 2·cumw ≥ total
    * test never touches doubles), so the hash-match needs no tolerance. */
  val q157 = QueryDef(
    "q157_weighted_median",
    oracle = Some("""
      WITH base AS (
        SELECT l_returnflag, l_quantity AS v,
          CAST(CAST(l_extendedprice AS DECIMAL(18,4))
            * (1 - CAST(l_discount AS DECIMAL(8,4))) AS DECIMAL(18,6)) AS w
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      c AS (
        SELECT l_returnflag, v, w,
          SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
          SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        FROM base)
      SELECT l_returnflag, MIN(v) AS weighted_median,
        CAST(MAX(tot) AS DOUBLE) AS total_weight
      FROM c WHERE cumw * 2 >= tot
      GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
    import graft.operators.Eval
    Eval.weightedMedian(
        Tables.load(s, dir, "lineitem")
          .filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull),
        "l_returnflag", col("l_quantity"),
        Compat.norm6(Compat.money(col("l_extendedprice"))
          * (lit(1) - Compat.frac(col("l_discount")))))
      .orderBy("l_returnflag")
  }

  /** Level-synchronous BFS (`Graph.bfs`): minimum hop count from the
    * smallest node of the part co-purchase graph (parts sharing an
    * order, 10% node sample), 4 hops. The oracle is a recursive CTE that
    * enumerates PATHS then takes MIN(hop) — same answer, exponentially
    * more work in dense graphs; the operator's per-level frontier dedup
    * is precisely what makes the distributed form scale (scaladoc). */
  val q144 = QueryDef(
    "q144_bfs",
    oracle = Some("""
      WITH RECURSIVE items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        WHERE l_partkey % 10 = 0),
      edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      bfs(node, hop) AS (
        SELECT src, 0 FROM (SELECT MIN(src) AS src FROM edges)
        UNION ALL
        SELECT e.dst, hop + 1 FROM bfs JOIN edges e ON e.src = bfs.node
        WHERE hop < 4)
      SELECT node, CAST(MIN(hop) AS INT) AS hops
      FROM bfs GROUP BY node ORDER BY node""")) { (s, dir) =>
    val items = Tables.load(s, dir, "lineitem")
      .filter(pmod(col("l_partkey"), lit(10L)) === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = items.alias("a")
      .join(items.alias("b"), Seq("l_orderkey"))
      .filter(col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    val seeds = edges.agg(min("src").as("node"))
    Graph.bfs(edges, seeds, maxHops = 4)
      .select(col("node"), col("hops"))
      .orderBy("node")
  }
}
