#!/usr/bin/env bash
# Generate synthetic scale-rehearsal fixtures beyond the driver's sf0.1:
# same ten tables/schemas/value ranges as /root/testdata (TESTDATA.md),
# deterministic, fully distributed (see graft.GenData). The pyarrow step
# rewrites events.ts_ns (LONG) to a physical TIMESTAMP(NANOS) column `ts`
# — the driver's events table is NANOS and Spark cannot write that type.
#
# Usage: tools/gen_sf.sh <outDir> <sf>     e.g. tools/gen_sf.sh /tmp/testdata/sf1 1.0
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="$1"; SF="$2"

sbt -batch "runMain graft.GenData $OUT $SF"

python3 - "$OUT" <<'EOF'
import sys, pyarrow as pa, pyarrow.parquet as pq
out = sys.argv[1]
t = pq.read_table(f"{out}/events.parquet")
ts = t.column("ts_ns").cast(pa.timestamp("ns"))
cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
t = t.drop(["ts_ns"]).append_column("ts", ts).select(cols)
# strip Spark's embedded row.metadata: it still describes ts_ns as LONG and
# Spark's reader trusts it over the physical parquet schema
t = t.replace_schema_metadata(None)
pq.write_table(t, f"{out}/events.parquet")
print("[gen] events ts -> TIMESTAMP(NANOS)")
EOF

ls -la "$OUT"
