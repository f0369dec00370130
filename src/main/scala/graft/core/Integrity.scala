package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Runtime integrity checks — the engine-side analog of the reference's
  * operational guards (finite-value output checks `check_finite_output`,
  * reference law.cfg:75-78; overlapping-input-column checks
  * `check_overlapping_inputs`, law.cfg:83-86): cheap assertions that turn
  * silent data corruption into loud task failures.
  *
  * `finiteReport` is ONE aggregation over the frame (all columns audited
  * in a single scan, like `stats/Profile`); `assertNoOverlap` is pure
  * schema arithmetic — no job at all.
  */
object Integrity {

  /** Per-column NaN / ±Inf counts over the float/double columns (or an
    * explicit subset). One scan; only offending columns appear.
    *
    * Explicitly requested columns must exist and be float/double —
    * otherwise a typo'd list would silently audit nothing and
    * `assertFinite` would pass vacuously. */
  def finiteReport(df: DataFrame, cols: Seq[String] = Nil): Seq[(String, Long, Long)] = {
    val allFloaty = df.schema.fields
      .filter(f => f.dataType == DoubleType || f.dataType == FloatType)
      .map(_.name)
    cols.foreach { c =>
      require(df.columns.contains(c), s"finiteReport: column '$c' does not exist")
      require(allFloaty.contains(c),
        s"finiteReport: column '$c' is not float/double — a finite check on it is vacuous")
    }
    val floaty = allFloaty.filter(n => cols.isEmpty || cols.contains(n))
    if (floaty.isEmpty) return Seq.empty
    val aggs = floaty.flatMap { c =>
      Seq(
        sum(when(isnan(col(c)), 1L).otherwise(0L)).as(s"${c}__nan"),
        sum(when(abs(col(c)) === Double.PositiveInfinity, 1L).otherwise(0L))
          .as(s"${c}__inf"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    floaty.toSeq.map { c =>
      (c,
        Option(row.getAs[Long](s"${c}__nan")).getOrElse(0L),
        Option(row.getAs[Long](s"${c}__inf")).getOrElse(0L))
    }.filter(r => r._2 > 0 || r._3 > 0)
  }

  /** Throw if any float/double column contains NaN or ±Inf — run on stage
    * outputs exactly like the reference's finite-output task guard. */
  def assertFinite(df: DataFrame, cols: Seq[String] = Nil): Unit = {
    val bad = finiteReport(df, cols)
    require(bad.isEmpty,
      "non-finite values in output: " +
        bad.map { case (c, nan, inf) => s"$c(nan=$nan, inf=$inf)" }.mkString(", "))
  }

  /** Order-free table fingerprint: Σ portable-hash64(canonical row) as an
    * exact decimal, plus the row count, optionally per group.
    *
    * The 100 TB table-equality primitive: comparing two copies of a table
    * (post-migration, post-rewrite, cross-engine) needs NO global sort and
    * NO co-shuffle — each side reduces to |groups| (sum, count) pairs with
    * full map-side partial aggregation, and addition's commutativity makes
    * the result partitioning- and encounter-order-independent. A mismatch
    * localizes to the group, so checksumming by date/shard turns "the
    * copies differ" into "shard 17 differs".
    *
    * Callers pass CANONICAL columns (cast doubles to a fixed-scale
    * decimal, timestamps to date/epoch) — raw double→string rendering is
    * not engine-portable. Null canonicalization: non-null
    * values render as 'v'||string, nulls as 'n' — a prefix code, so a
    * null can never collide with ANY real value (including "n").
    *
    * The checksum is the exact decimal Σ of per-row hashes reduced mod
    * 2⁶¹−1 and emitted as BIGINT: a wide-decimal output column is itself
    * an engine-portability hazard (other engines render DECIMAL(38,0) /
    * int128 sums as float64), while a 61-bit residue survives every
    * integer pipeline bit-exactly. Addition before the mod keeps the
    * reduction commutative/order-free; the residue loses no discriminating
    * power that the 64-bit row hash had to begin with. */
  def tableChecksum(df: DataFrame, cols: Seq[org.apache.spark.sql.Column],
                    groupBy: Seq[String] = Nil): DataFrame = {
    require(cols.nonEmpty, "tableChecksum: need at least one column")
    val repr = concat_ws("|",
      cols.map(c => when(c.isNull, lit("n"))
        .otherwise(concat(lit("v"), c.cast("string")))): _*)
    val h = graft.functions.Seeds.portableHash64(repr).cast("decimal(38,0)")
    val m = lit(ChecksumModulus)
    def residue(s: org.apache.spark.sql.Column) =
      ((s % m + m) % m).cast("long")
    if (groupBy.isEmpty)
      df.agg(count(lit(1)).as("n_rows"), residue(sum(h)).as("checksum"))
    else
      df.groupBy(groupBy.map(col): _*)
        .agg(count(lit(1)).as("n_rows"), residue(sum(h)).as("checksum"))
  }

  /** Mersenne prime 2⁶¹−1: the checksum residue modulus. Prime ⇒ the sum
    * map stays uniform; < 2⁶³ ⇒ the residue is a plain BIGINT in every
    * engine. */
  val ChecksumModulus: Long = 2305843009213693951L

  /** Row-level diff of two table snapshots keyed on `keys`: one row per
    * key present in either side, with status `added` / `removed` /
    * `changed` / `unchanged` judged over the CANONICAL compare columns
    * (same portability contract as [[tableChecksum]] — cast doubles to
    * fixed-scale decimal, timestamps to date/epoch).
    *
    * Each side reduces to (keys, 8-byte row hash) BEFORE the join — the
    * full-outer co-shuffle carries hashes, never payload columns, so
    * diffing two 100 TB snapshots exchanges key-width data. With both
    * snapshots bucketed on the keys the exchange disappears entirely.
    * Status comparison is hash equality (md5 lower-64 per row): an
    * engine-portable judgment, collision odds ~2⁻⁶⁴ per pair. Keys must
    * be non-null: SQL null keys never join-match, so a null-keyed row
    * would double-report as one `removed` plus one `added`. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   cols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(cols.nonEmpty, "snapshotDiff: need at least one compare column")
    def hashed(df: DataFrame, as: String) = {
      val repr = concat_ws("|",
        cols.map(c => when(c.isNull, lit("n"))
          .otherwise(concat(lit("v"), c.cast("string")))): _*)
      df.select(keys.map(col) :+
        graft.functions.Seeds.portableHash64(repr).as(as): _*)
    }
    hashed(oldDf, "__h_old").join(hashed(newDf, "__h_new"), keys, "full")
      .withColumn("status",
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") === col("__h_new"), "unchanged")
          .otherwise("changed"))
      .select(keys.map(col) :+ col("status"): _*)
  }

  /** Deequ-style rule audit: every named predicate is counted in ONE
    * scan (sibling conditional-sum aggregates — no per-rule pass), and
    * the result unpivots to (rule, n_violations, n_rows). Null predicate
    * results count as violations: an unevaluable rule is a failing rule,
    * not a silent pass. FK/orphan rules need a join, not a predicate —
    * see [[orphanCount]]. */
  def auditRules(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "auditRules: need at least one rule")
    val aggs = count(lit(1)).as("__n") +:
      rules.map { case (name, pred) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(name)
      }
    val entries = rules.flatMap { case (name, _) => Seq(lit(name), col(name)) }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"), explode(map(entries: _*)).as(Seq("rule", "n_violations")))
      .select(col("rule"), col("n_violations"), col("__n").as("n_rows"))
  }

  /** Referential-integrity violation count: child rows whose `childKey`
    * has no match in `parent` (`parentKey`). Anti-join — broadcast when
    * the parent is a dimension, shuffle-hash otherwise; nulls in the
    * child key count as orphans (an unresolvable reference). */
  def orphanCount(child: DataFrame, parent: DataFrame,
                  childKey: String, parentKey: String): DataFrame = {
    val p = parent.select(col(parentKey).as("__pk")).distinct()
    child.select(col(childKey).as("__ck"))
      .join(p, col("__ck") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
  }

  /** Throw if two diff inputs would write the same non-key column — the
    * mis-declared-produces guard run before a merge. Schema-only. */
  def assertNoOverlap(keys: Seq[String], dfs: DataFrame*): Unit = {
    val owned = scala.collection.mutable.Map.empty[String, Int]
    dfs.zipWithIndex.foreach { case (df, i) =>
      df.columns.filterNot(keys.contains).foreach { c =>
        owned.get(c).foreach { j =>
          throw new IllegalArgumentException(
            s"column '$c' produced by both input #$j and input #$i — " +
              "overlapping diff columns indicate a mis-declared produces set")
        }
        owned(c) = i
      }
    }
  }
}
