#!/usr/bin/env bash
# Round-19 measurement sequence (run serially — rule 6: never overlap
# sbt runs). Logs land in /tmp/r19_runs/.
# Phase 1 (done, cap-64 A/B — model-fit evidence): gr_512k/gr_1m/gr_2m
# at np=64 measured tau-recall 0.621/0.603/0.529 vs the log-linear
# model's 0.624/0.605/0.511 — the flat cap decays ~0.11 per doubling.
# Phase 2 (this file): the n^0.2 production rule at the binding rungs.
set -uo pipefail
cd "$(dirname "$0")/.."
L=/tmp/r19_runs
mkdir -p "$L"
run() { # run <name> <sbt main + args...>
  local name=$1; shift
  echo "=== $name: $* $(date +%H:%M:%S)" | tee -a "$L/driver.log"
  sbt -batch "runMain $*" >"$L/$name.log" 2>&1
  echo "=== $name rc=$? $(date +%H:%M:%S)" | tee -a "$L/driver.log"
}

# 1) the n^0.2 rule at the rungs where it binds (512k stays np=90,
#    measured 0.709 in r18 — unchanged by construction)
run gr2_1m graft.GraphRecall /tmp/graft_recall_ladder_512x 0.64
run gr2_2m graft.GraphRecall /tmp/graft_recall_ladder_1024x 0.64

# 2) drift -> refresh -> graph-rebuild economics at 1M
run gdrift_1m graft.GraphDriftSmoke /tmp/graft_recall_ladder_512x 3

# 3) production-shaped fold attribution: corpus (worst case) vs cell
#    (small-ring) at 512k and 1M
run fp_512k_corpus graft.FoldProbe /tmp/graft_recall_ladder_256x 3 2000 r19c corpus
run fp_512k_cell   graft.FoldProbe /tmp/graft_recall_ladder_256x 3 2000 r19d cell
run fp_1m_cell     graft.FoldProbe /tmp/graft_recall_ladder_512x 3 2000 r19e cell

# 4) streamed graph ingest at the 512k rung (8 x 2k batches,
#    compact/maintain cadence 4)
run gstream_512k graft.GraphStreamSmoke /tmp/graft_recall_ladder_256x 3 8 2000 4

# 5) BPE trainer at the DriverBpeMaxVocab cap (2M distinct words)
run bpe_2m graft.BpeTrainGate 32000 2000000 10

echo "=== ALL DONE $(date +%H:%M:%S)" | tee -a "$L/driver.log"
