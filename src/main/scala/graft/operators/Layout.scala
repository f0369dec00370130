package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Morton (Z-order) interleaving for
  * multi-dimensional data skipping.
  *
  * A 100 TB table range-partitioned and sorted by `zValue16(x, y)` keeps
  * BOTH dimensions' min/max file statistics tight, so predicates on
  * either column prune files — the property a single-column sort gives
  * only its leading column. `zorderRepartition` is the write-side op;
  * `zValue16` is the pure closed-form bit spread (shift/mask only — no
  * loops, no UDF, codegen-friendly, and expressible verbatim in any
  * engine with bitwise ops, see [[zValue16Sql]]).
  */
object Layout {

  /** Spread the low 16 bits of `v` to even bit positions (0,2,4,…,30) —
    * the classic magic-mask Morton spread. */
  private def spread16(v: Column): Column = {
    val a = v.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit values (x even bits, y odd). */
  def zValue16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  private def spread16Sql(e: String): String = {
    val a = s"(($e) & 65535)"
    val b = s"(($a | ($a << 8)) & 16711935)"
    val c = s"(($b | ($b << 4)) & 252645135)"
    val d = s"(($c | ($c << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }

  /** DuckDB mirror of [[zValue16]] — identical shift/mask arithmetic. */
  def zValue16Sql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  /** Range-partition (and sort within partitions) by the Morton code of
    * two dimensions — the layout step before a parquet write whose file
    * min/max stats should prune on either column. */
  def zorderRepartition(df: DataFrame, x: Column, y: Column,
                        partitions: Int): DataFrame = {
    val z = zValue16(x, y).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
