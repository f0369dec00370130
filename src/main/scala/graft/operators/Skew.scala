package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the piece of 100 TB engineering that no
  * local test exposes: one pathological key (a null join field, a viral
  * user, an empty-string document) lands an entire shuffle partition on
  * one executor and the stage runs at the speed of that straggler.
  *
  * Two standard remedies, both deterministic:
  *
  *   - AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  *     on in Bench/Verify sessions) handles moderate skew at runtime with
  *     zero code. Use it first.
  *   - Salting, for the cases AQE can't fix: aggregations whose single
  *     hot group exceeds one task, and broadcast-ineligible joins with a
  *     hot key. The fact side gets a deterministic salt in [0, n); the
  *     dim side is replicated n×; aggregations run two-stage.
  */
object Skew {

  /** Deterministic salt in [0, buckets): stable across retries (uses the
    * row's own key columns, not a random source). */
  def salt(buckets: Int, keys: Column*): Column =
    pmod(xxhash64(keys: _*), lit(buckets)).cast("int")

  /** Two-stage salted aggregation: groupBy (key, salt) partial-aggregates
    * a hot key into `buckets` cells, then the tiny second stage combines.
    * `aggs` must be algebraic (sum/count/min/max — mergeable). */
  def saltedSum(df: DataFrame, groupCols: Seq[String], saltFrom: Seq[String],
                buckets: Int, sums: Map[String, Column]): DataFrame = {
    val stage1 = df
      .withColumn("__salt", salt(buckets, saltFrom.map(col): _*))
      .groupBy((groupCols :+ "__salt").map(col): _*)
      .agg(sums.head._2.as(sums.head._1),
        sums.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    stage1
      .groupBy(groupCols.map(col): _*)
      .agg(sum(sums.head._1).as(sums.head._1),
        sums.tail.keys.map(n => sum(n).as(n)).toSeq: _*)
  }

  /** Salted equi-join: fact rows get salt(s) from their own key; the dim
    * side is exploded `buckets`× so every (key, salt) finds its partner.
    * Correct for any 1:N fact⋈dim equi-join; dim grows buckets× (keep it
    * the small side). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(buckets, col(key)))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedFact.join(explodedDim,
      saltedFact(key) === explodedDim(key) &&
        saltedFact("__salt") === explodedDim("__salt"), joinType)
      .drop(explodedDim(key)).drop("__salt")
  }
}
