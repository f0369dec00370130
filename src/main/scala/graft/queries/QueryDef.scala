package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A registered query: Spark implementation + optional DuckDB oracle SQL.
  *
  * The driver hash-compares the Spark result against the oracle run on the
  * same parquet files, sorting columns by name first — so every computed
  * column must carry the same alias on both sides.
  *
  * @param bench whether Bench.scala includes it in the headline timing set
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    bench: Boolean = false)(
    val fn: (SparkSession, String) => DataFrame)

/** Cross-engine determinism helpers.
  *
  * IEEE-754 `+ - * /` and `sqrt` are correctly rounded, so per-row double
  * arithmetic is bit-identical between Spark (JVM) and DuckDB (C++). Two
  * things are NOT reproducible and must be routed around:
  *
  *   1. Aggregation order — Spark's partial aggregation sums doubles in a
  *      different order than DuckDB's sequential scan, so `sum(double)`
  *      differs in the last ulps. Fix: cast to decimal BEFORE summing —
  *      decimal arithmetic is exact and order-independent — and cast the
  *      final aggregate back to double.
  *   2. libm transcendentals (cos/sin/atan2/ln/exp) — last-ulp differences
  *      between JVM and libm. Fix: round to a scale far coarser than one
  *      ulp at the value's magnitude before aggregating.
  *
  * One more trap: the decimal cast itself. Spark rounds the double's
  * SHORTEST decimal representation (BigDecimal.valueOf) while DuckDB
  * rounds the exact binary value — they disagree precisely when the value
  * sits on a tie at the cast scale. Safe casts are ones that never round:
  * keep the cast scale strictly above the data's intended decimal scale
  * (money data has 2 decimals → scale-4 casts are exact; never construct
  * values like `price/100000` whose 7th decimal is a digit and cast at
  * scale 6).
  */
object Compat {
  /** Exact decimal view of a price-like double (scale 4 ≫ data's 2). */
  def money(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact decimal view of a small fraction (discount/tax/rate). */
  def frac(c: Column): Column = c.cast(DecimalType(8, 4))

  /** Order-independent sum of a decimal expression, surfaced as double. */
  def dsum(c: Column): Column = sum(c).cast("double")

  /** Order-independent mean: exact decimal sum, then one double divide. */
  def davg(c: Column): Column = sum(c).cast("double") / count(lit(1))

  /** Decimal view of a libm-computed value (scale 6 absorbs ulp noise). */
  def libm(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Normalize a money×fraction product to scale 6 BEFORE summing. The
    * product of 2-decimal money and 2-decimal rates has ≤ 6 decimal
    * digits, so this cast never rounds — but it caps the SUM's scale at 6
    * instead of the 8–12 the multiply rules produce. That matters because
    * DuckDB converts decimal→double as double(unscaled)/double(10^scale),
    * which double-rounds once the unscaled sum exceeds 2^53 (scale 12 puts
    * ~1e7 sums at ~1e19); at scale 6 the unscaled value stays exact and
    * both engines' conversions are correctly rounded. */
  def norm6(c: Column): Column = c.cast(DecimalType(18, 6))

  // DuckDB-side SQL fragments mirroring the helpers above.
  def moneySql(e: String) = s"CAST($e AS DECIMAL(18,4))"
  def fracSql(e: String) = s"CAST($e AS DECIMAL(8,4))"
  def libmSql(e: String) = s"CAST($e AS DECIMAL(18,6))"
  def norm6Sql(e: String) = s"CAST($e AS DECIMAL(18,6))"

  /** Correctly-rounded DECIMAL→DOUBLE for the oracle, at ANY magnitude.
    * DuckDB's direct cast computes double(unscaled)/double(10^scale),
    * which double-rounds once the unscaled value passes 2^53 — the sf1
    * rehearsal caught q1's sum_charge (scale-6 sum ≈ 1.3e10 → unscaled
    * 1.3e16) off Spark's correctly-rounded BigDecimal path by 2e-6.
    * Routing through VARCHAR is exact: decimal→varchar emits the exact
    * digits, varchar→double is a correctly-rounded strtod. Wrap every
    * corpus-sized decimal SUM that a 10×-larger fixture could push past
    * 2^53 unscaled. */
  def exactDoubleSql(e: String) = s"CAST(CAST(($e) AS VARCHAR) AS DOUBLE)"

  /** DuckDB mirror of Spark's `round(x, d)` SEMANTICS, not just its
    * grid: Spark rounds the double's SHORTEST DECIMAL REPRESENTATION
    * half-up (BigDecimal.valueOf), DuckDB's ROUND rounds the exact
    * binary value — they split on every TRUE decimal tie at scale d
    * (sf1 rehearsal: the JEC L2 interp factor for on-grid momenta is
    * exactly 1.0018215; Spark → 1.001822, DuckDB binary → 1.001821,
    * 51 divergent cells at sf1 and growing linearly with the corpus).
    * DuckDB's double→VARCHAR cast emits the same shortest repr, the
    * varchar→DECIMAL(38,18) cast is digit-exact for |x| in [1e-2, 1e19]
    * (shortest reprs carry ≤ 17 significant digits), and decimal ROUND
    * is half-away-from-zero ≡ HALF_UP on the magnitude — so this form
    * reproduces Spark's result bit-for-bit, ties included. Result is a
    * DECIMAL(38,d); its double conversion is exact for x < 2^53/10^d.
    *
    * MAGNITUDE-ADAPTIVE: a single parse scale can't cover the double
    * line — DECIMAL(38,18) truncates shortest-repr digits of tiny
    * magnitudes (17 sig digits starting at decimal position 3+ extend
    * past scale 18, and the parse ROUNDS there, which can push a
    * just-below-tie value onto the tie) and overflows at 1e20, while
    * DECIMAL(38,30) overflows at 1e8. So: |x| < 1e-12 rounds to 0
    * outright (no tie exists within 1e-12 of the 0.5·10^-d boundary for
    * d ≤ 11); |x| < 1e7 parses at scale 30 (first sig digit at position
    * ≤ 12 → repr ends by position 28 — digit-exact); |x| < 1e19 parses
    * at scale 18 (≤ 9 fraction digits in the repr — digit-exact);
    * anything larger ERRORs loudly, a red oracle row beating a silent
    * 1-ulp drift. Verified against the JVM semantics on 56k doubles
    * including exact decimal ties at every magnitude/sign (round-8
    * sweep; the tie lattice is the adversarial class). */
  def roundSql(e: String, d: Int) = {
    // `$e` is interpolated into each CASE branch (5×), so it may be
    // EVALUATED several times per row: `e` must be deterministic and
    // cheap. A volatile argument (random(), now()) would make the
    // magnitude test and the rounded branch see different values and
    // diverge silently; an expensive subexpression should be bound to a
    // named column/CTE at the call site first. Every current call site
    // passes pure arithmetic over table columns.
    require(d >= 0 && d <= 11, s"roundSql scale outside the verified [0,11] window: $d")
    s"""(CASE WHEN ($e) = 0 OR ABS($e) < 1e-12 THEN CAST(0 AS DECIMAL(38,$d))
          WHEN ABS($e) < 1e7 THEN ROUND(CAST(CAST(($e) AS VARCHAR) AS DECIMAL(38,30)), $d)
          WHEN ABS($e) < 1e19 THEN ROUND(CAST(CAST(($e) AS VARCHAR) AS DECIMAL(38,18)), $d)
          ELSE CAST(ERROR('roundSql domain: |x| >= 1e19') AS DECIMAL(38,$d)) END)"""
  }

  /** [[roundSql]] to the integer grid, surfaced as BIGINT — the oracle
    * mirror of grid quantization (`round(v*grid)` → long sums). Same
    * HALF_UP-on-shortest-repr semantics; the BIGINT guard trips before
    * the cast could wrap. */
  def roundToLongSql(e: String) =
    s"""(CASE WHEN ABS($e) >= 1e18
          THEN CAST(ERROR('roundToLongSql domain: |x| >= 1e18') AS BIGINT)
          ELSE CAST(${roundSql(e, 0)} AS BIGINT) END)"""
}
