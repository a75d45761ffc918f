#!/usr/bin/env bash
# 128x hash gate for the composed curation pipeline (q_pipeline_curate).
#
# All three historical 10x-class plan bugs (the ExtractGenerator hoist,
# the crossJoin argmax materialization, the fused-expression de-JIT)
# lived at the 128x-class rung, where q_pipeline_curate had previously
# only been TIMED — this gate makes the rung result-checked: replicate
# the documents table K times (the only input the pipeline reads), run
# Verify on the replica, and hash-compare against DuckDB running the
# same five-stage SQL.
#
# Label scale by absolute n, not k (CLAUDE.md rule 16): the default
# 128 x sf0.1 is 640k documents.
#
# Usage: tools/curate_gate.sh [k] [srcDir]
set -euo pipefail
K="${1:-128}"
SRC="${2:-/root/testdata/sf0.1}"
cd "$(dirname "$0")/.."
SPARK_GRAFT_SMOKE_TABLES=documents \
SCALE_GATE_QUERIES=q_pipeline_curate \
SCALE_GATE_NO_RECALL=1 \
  tools/scale_gate.sh "$K" "$SRC" /tmp/graft_curate_gate /tmp/graft_curate_gate_out
echo "CURATE GATE OK: q_pipeline_curate hash-matched DuckDB at ${K}x ${SRC}"
