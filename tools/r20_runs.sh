#!/usr/bin/env bash
# Round-20 measurement sequence (run serially — rule 6: never overlap
# sbt runs). Logs land in /tmp/r20_runs/.
#
# Phase 0 (done ad-hoc, pre-contract): the per-round refine curve off
# a flat-64 ring at 512k — GRAFT_KNNG_NPROBE_CAP=64 GraphRecall
# <256x> 0 0 3 read 0.797/0.798/0.798 across rounds 1-3 (ring 0.620,
# build 103.2 s) — the two facts the r20 contract constants encode:
# refinement converges in ONE round from any seed, and its ceiling
# tracks the seed ring's width (~ +0.105 tau per np doubling against
# r19's 0.849 @ np90).
#
# Phase 1 (this file): the shipped contract (flat-64 ring + 1 baked
# refine round) at the binding rungs, the fold-decay curve that sets
# DefaultRefineAfter, the 2M drift-repair cycle, and the 1M streamed
# ingest with a mid-stream drift repair.
set -uo pipefail
cd "$(dirname "$0")/.."
L=/tmp/r20_runs
mkdir -p "$L"
run() { # run <name> <sbt main + args...>
  local name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" | tee -a "$L/driver.log"
  sbt -batch "runMain $*" >"$L/$name.log" 2>&1
  echo "=== $name rc=$? $(date +%H:%M:%S)" | tee -a "$L/driver.log"
}

# 1) the refined artifact at every ladder rung (floor applies to what
#    graphEdges actually serves now; the refineRounds=1 leg measures
#    one FURTHER round — the q_graph_refine surface)
run gr20_512k graft.GraphRecall /tmp/graft_recall_ladder_256x 0.72 0 1
run gr20_1m   graft.GraphRecall /tmp/graft_recall_ladder_512x 0.72 0 1
run gr20_2m   graft.GraphRecall /tmp/graft_recall_ladder_1024x 0.72 0 1

# 2) refinement decay under incremental folds at 512k — the
#    DefaultRefineAfter evidence (8 x 2k fresh-id corpus slices,
#    tau measured after every fold, then one refineKnnGraphIndex)
run gdecay_512k graft.GraphFoldDecayProbe /tmp/graft_recall_ladder_256x 3 8 2000

# 3) drift -> refresh -> graph-rebuild economics at 2M under the new
#    contract (the r19 number was 1M/ring-contract)
run gdrift_2m graft.GraphDriftSmoke /tmp/graft_recall_ladder_1024x 3

# 4) streamed graph ingest at 1M with a CONCENTRATED-drift batch
#    mid-stream: the maintain cadence's IVF refresh + in-stream graph
#    rebuild (driftAt=4, cadence=4 -> repair lands in batch 7's wall).
#    SPARK_DRIVER_MEM=48g: local-mode puts the cold 1M build's
#    checkpoints, every fold's blocks AND the in-stream 1M rebuild in
#    ONE JVM — 16g OOM'd the context cleaner mid-stream (a
#    measurement-harness constraint, not a library one: a real
#    cluster's driver never hosts executor blocks)
SPARK_DRIVER_MEM=48g \
  run gstream_1m graft.GraphStreamSmoke /tmp/graft_recall_ladder_512x 3 8 2000 4 0.70 4

echo "=== ALL DONE $(date +%H:%M:%S)" | tee -a "$L/driver.log"
