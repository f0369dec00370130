#!/usr/bin/env python3
"""Reproducible cross-engine fuzz of Compat.roundSql / roundToLongSql.

Checks that the DuckDB SQL emitted by graft.queries.Compat.roundSql
reproduces the JVM semantics Spark's round() applies — HALF_UP on the
double's SHORTEST DECIMAL REPRESENTATION (BigDecimal.valueOf) — across
magnitudes 1e-15..1e17, both signs, for every scale the mirror accepts,
with the adversarial class included explicitly: values constructed to sit
EXACTLY on decimal ties at the rounding scale (where binary-value ROUND
and shortest-repr HALF_UP are most likely to split).

The python emulation of the JVM side is exact: python repr() and Java
Double.toString both emit the shortest round-tripping decimal repr, and
decimal.quantize(ROUND_HALF_UP) == BigDecimal.setScale(HALF_UP).

Usage: python3 tools/roundsql_fuzz.py [n_random_per_class] [seed]
Exits nonzero on any mismatch. ~56k checks at the default size.
"""
import sys, random, struct, decimal
import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 123


def round_sql(e, d):
    """Mirror of Compat.roundSql — keep in sync with QueryDef.scala."""
    return f"""(CASE WHEN ({e}) = 0 OR ABS({e}) < 1e-12 THEN CAST(0 AS DECIMAL(38,{d}))
     WHEN ABS({e}) < 1e7 THEN ROUND(CAST(CAST(({e}) AS VARCHAR) AS DECIMAL(38,30)), {d})
     WHEN ABS({e}) < 1e19 THEN ROUND(CAST(CAST(({e}) AS VARCHAR) AS DECIMAL(38,18)), {d})
     ELSE CAST(ERROR('roundSql domain: |x| >= 1e19') AS DECIMAL(38,{d})) END)"""


def spark_round(x, d):
    return decimal.Decimal(repr(x)).quantize(
        decimal.Decimal(1).scaleb(-d), rounding=decimal.ROUND_HALF_UP)


def main():
    random.seed(SEED)
    con = duckdb.connect()
    vals = []
    # exact decimal ties at every (scale, magnitude, sign)
    for d in (0, 1, 4, 6, 9, 11):
        for mag in range(-12, 16):
            for _ in range(4):
                base = random.randint(0, 9 * 10 ** max(0, d))
                v = (base + 0.5) * 10 ** (-d) * 10 ** mag
                vals += [v, -v]
    # uniform-over-bit-patterns doubles
    for _ in range(N):
        v = struct.unpack('d', struct.pack('Q', random.getrandbits(62)))[0]
        if v == v and abs(v) < 1e18:
            vals.append(v)
    # uniform-over-log-magnitude doubles
    for _ in range(N):
        vals.append(random.uniform(-1, 1) * 10 ** random.randint(-15, 17))
    vals = [v for v in vals if abs(v) < 1e19]

    bad = tot = 0
    for d in (0, 1, 4, 6, 9, 11):
        for s in range(0, len(vals), 400):
            chunk = vals[s:s + 400]
            sql = "SELECT " + ",".join(
                round_sql(repr(v), d) + f" AS c{i}" for i, v in enumerate(chunk))
            for v, got in zip(chunk, con.sql(sql).fetchone()):
                tot += 1
                if decimal.Decimal(got) != spark_round(v, d):
                    bad += 1
                    if bad <= 8:
                        print(f"MISMATCH d={d} v={v!r} duckdb={got} jvm={spark_round(v, d)}")
    print(f"checked {tot} (ties + {2 * N} random), mismatches: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
