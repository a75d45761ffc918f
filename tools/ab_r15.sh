#!/bin/bash
# Round-15 wide same-window A/B: HEAD (A) vs r12 commit 2b2e683 (B, /tmp/graft_ab).
# 9 heavy queries shared by both commits + 5 light controls, reps=3 interleaved
# inside each run, ABBA across runs so a host-noise burst can't cover one side.
set -u
SUBSET=q_dedup_groups,q_pipeline_curate,q_ngram_jaccard,q_join_skew,q_window_rank,q_ngram_lm,q_sql_tpch_q3,q_perplexity_filter,q_math_funcs,q_scan,q_limit,q_topk,q_keys,q_manifest
OUT=/tmp/ab_r15
mkdir -p "$OUT"
run() {  # run <dir> <tag>
  cd "$1" || exit 1
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY="$SUBSET" SPARK_GRAFT_REPS=3 \
    sbt -batch "runMain graft.Bench" > "$OUT/$2.out" 2>&1
  echo "$2 rc=$?"
}
run /root/repo a1
run /tmp/graft_ab b1
run /tmp/graft_ab b2
run /root/repo a2
echo ABBA_DONE
