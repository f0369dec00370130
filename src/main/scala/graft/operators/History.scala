package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history building — the warehouse companion of
  * [[graft.core.UpdateMerge.upsertRows]]: where upsert keeps only the
  * latest row per key, `scd2` keeps every version with its validity
  * interval (SCD type 2).
  *
  * One window per key (`lead` over the change order) — the shuffle
  * partitions on the dimension key, so a 100 TB change log builds its
  * history with a single exchange and no self-join.
  */
object History {

  /** Attach validity intervals to a change log: for each `keys` group
    * ordered by (`orderCol`, `tieBreak`), adds
    *
    *   - `eff_from`  — the change's own order value
    *   - `eff_to`    — the next change's order value (null = open-ended)
    *   - `is_current` — 1 when `eff_to` is null, else 0 (int for
    *     cross-engine hash stability)
    *
    * `tieBreak` must make the order total (e.g. a unique event id) — equal
    * order keys would otherwise make interval assignment nondeterministic. */
  def scd2(changes: DataFrame, keys: Seq[String], orderCol: String,
           tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol), col(tieBreak))
    changes
      .withColumn("eff_from", col(orderCol))
      .withColumn("eff_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", when(col("eff_to").isNull, 1).otherwise(0))
  }
}
