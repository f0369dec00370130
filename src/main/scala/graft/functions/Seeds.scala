package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic seeds and fold assignment
  * (reference: columnflow/production/cms/seeds.py:26-312
  * `create_seed`/`deterministic_event_seeds`; ML fold split
  * columnflow/tasks/ml.py:221 `seed % folds`).
  *
  * Two families:
  *   - `eventSeed` (xxhash64): the production path — 64-bit, codegen'd,
  *     stable across partitionings/runs. Use for RNG streams and salting.
  *   - `portableSeed`/`fold` (md5-hex): slower but reproducible in ANY
  *     engine with md5 + string ops — used where a cross-engine oracle
  *     must re-derive the same assignment.
  */
object Seeds {

  /** 64-bit deterministic seed from identity columns (xxhash64 path). */
  def eventSeed(cols: Column*): Column = xxhash64(cols: _*)

  /** Engine-portable seed: md5 hex of the '|'-joined key columns. */
  def portableSeed(cols: Column*): Column = md5(concat_ws("|", cols: _*))

  /** k-fold assignment from the portable seed (reference fold split). */
  def fold(k: Int, cols: Column*): Column = pmod(portableSeedNum(cols: _*), lit(k))

  /** Lower 64 bits of the md5 digest as a SIGNED long (two's complement) —
    * the engine-portable 64-bit hash: any engine that reads hex digits
    * 17..32 of the md5 as an unsigned value and re-signs at 2^63 gets the
    * identical bit pattern, so bitwise consumers (SimHash majority votes,
    * Hamming distance) agree across engines. Implemented as a native
    * codegen kernel reading the digest bytes directly
    * (`HashKernels.Md5Lower64`); the builtin-chain formulation
    * (`conv(substring(md5(c), 17, 16), 16, 10)` through decimal
    * re-signing) is value-identical, asserted in `HashKernelsSpec`. */
  def portableHash64(c: Column): Column = HashKernels.md5Lower64Col(c)

  /** The builtin-only formulation of [[portableHash64]] — value-identical;
    * kept for engines/plans where the custom Expression is unavailable. */
  def portableHash64Builtin(c: Column): Column = {
    import org.apache.spark.sql.types.DecimalType
    val dec = conv(substring(md5(c), 17, 16), 16, 10).cast(DecimalType(20, 0))
    (dec - when(dec >= lit(BigDecimal("9223372036854775808")),
      lit(BigDecimal("18446744073709551616"))).otherwise(lit(BigDecimal(0))))
      .cast("long")
  }

  /** Hex-digit value via one `instr` against the alphabet — the SQL-98
    * shape every engine reproduces bit-for-bit (the oracle mirrors use
    * the same `instr('0123456789abcdef', ch) - 1`). An equality-chain
    * formulation is value-identical but ~16 string compares per digit —
    * measured minutes-slow when a five-member aggregate draws the
    * portable RNG ten times per row (q81). */
  private[functions] def hexDigitVal(ch: Column): Column =
    call_function("instr", lit("0123456789abcdef"), ch) - 1

  /** First 4 hex digits of the portable seed as an integer in [0, 65536). */
  def portableSeedNum(cols: Column*): Column = {
    val hex = portableSeed(cols: _*)
    (0 until 4).map { i =>
      hexDigitVal(substring(hex, i + 1, 1)) * lit(1 << (4 * (3 - i)))
    }.reduce(_ + _)
  }

  /** SQL mirror of `fold` for DuckDB oracles. */
  def foldSql(k: Int, keyExpr: String): String = {
    val hex = s"md5($keyExpr)"
    val num = (0 until 4).map { i =>
      s"(instr('0123456789abcdef', substring($hex, ${i + 1}, 1)) - 1) * ${1 << (4 * (3 - i))}"
    }.mkString(" + ")
    s"(($num) % $k)"
  }

  /** Spark-side twin of foldSql — uses instr like the oracle. */
  def foldFromExpr(k: Int, keyExpr: String): Column = expr(foldSql(k, keyExpr))
}
