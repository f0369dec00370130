package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic per-row randomness — the reference's layout-preserving
  * seeded RNG (reference ak_random: columnflow/calibration/util.py:18-40;
  * used for JER stochastic smearing columnflow/calibration/cms/jets.py:
  * 917-1224). Spark's rand()/randn() are seeded per-PARTITION, so results
  * change under repartitioning — useless for reproducible physics. These
  * generators are pure functions of identity columns: stable across any
  * partitioning, any cluster size, any retry.
  *
  * SURVEY §7.4 lists a custom counter-based RNG Expression as potential
  * custom work; composing builtin hash + math functions achieves the same
  * determinism inside whole-stage codegen with zero custom code, per the
  * "compose existing ops first" preference (SURVEY §2 custom-operator
  * order).
  */
object Rand {

  /** Uniform in (0, 1): 53 hash bits via xxhash64 of the key columns.
    * Offset by 0.5 ulp so 0 is excluded (log-safe). */
  def uniform(keys: Column*): Column =
    (shiftrightunsigned(xxhash64(keys: _*), 11).cast("double") + 0.5) /
      lit(9007199254740992.0) // 2^53

  /** Second independent uniform from the same keys (decorrelated stream). */
  def uniform2(keys: Column*): Column =
    uniform((lit(0x9E3779B9L) +: keys): _*)

  /** Standard normal via Box–Muller — deterministic per row. */
  def gaussian(keys: Column*): Column =
    sqrt(lit(-2.0) * log(uniform(keys: _*))) *
      cos(lit(2.0 * math.Pi) * uniform2(keys: _*))

  /** Gaussian with mean/width (the JER smear shape:
    * `smeared = x * (1 + width * N(0,1))`). */
  def smear(x: Column, width: Column, keys: Column*): Column =
    x * (lit(1.0) + width * gaussian(keys: _*))

  // --- engine-portable variant (md5-based, mirrors in any SQL dialect) ---

  /** Uniform in (0,1) from 4 md5 hex digits: (n+0.5)/65536 — coarse (16
    * bits) but reproducible from the same SQL text in any engine. `off`
    * selects a disjoint digit window for independent streams. */
  def portableUniform(off: Int, keys: Column*): Column =
    (portableHexNum(off, keys: _*).cast("double") + 0.5) / 65536.0

  private[graft] def portableHexNum(off: Int, keys: Column*): Column = {
    val hex = md5(concat_ws("|", keys: _*))
    (0 until 4).map { i =>
      // one instr per digit — see Seeds.hexDigitVal for why not a when-chain
      Seeds.hexDigitVal(substring(hex, off + i + 1, 1)) * lit(1 << (4 * (3 - i)))
    }.reduce(_ + _)
  }

  /** Portable Box–Muller gaussian (two disjoint 16-bit windows). */
  def portableGaussian(keys: Column*): Column =
    sqrt(lit(-2.0) * log(portableUniform(0, keys: _*))) *
      cos(lit(2.0 * math.Pi) * portableUniform(8, keys: _*))

  /** SQL mirrors for DuckDB oracles. */
  def portableUniformSql(off: Int, keyExpr: String): String = {
    val hex = s"md5($keyExpr)"
    val num = (0 until 4).map { i =>
      s"(instr('0123456789abcdef', substring($hex, ${off + i + 1}, 1)) - 1) * ${1 << (4 * (3 - i))}"
    }.mkString(" + ")
    // explicit double cast: Spark SQL parses non-integral literals as
    // DECIMAL, which would make this division decimal arithmetic (rounded
    // at decimal scale) instead of the Column version's double division
    s"(CAST(($num) + 0.5 AS DOUBLE) / 65536.0)"
  }

  def portableGaussianSql(keyExpr: String): String =
    s"(sqrt(-2.0 * ln(${portableUniformSql(0, keyExpr)})) * " +
      s"cos(${2.0 * math.Pi} * ${portableUniformSql(8, keyExpr)}))"
}
