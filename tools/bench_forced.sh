#!/usr/bin/env bash
# Forced-distributed-tier bench sweep (r11, VERDICT item 1): the graph /
# iterative queries with SPARK_GRAFT_COLLECT_THRESHOLD=0, so the AT-SCALE
# formulations — the ones that exist at 100 TB, where no collect tier
# does — get a RECORDED performance series, not just a correctness gate.
# Round-close protocol: run this once per round, commit the output as
# BENCH_FORCED_r{N}.json, and root-cause any per-query regression >1.3x
# round-over-round against the previous file.
#
# Usage: tools/bench_forced.sh [out.json]   (from /root/repo)
set -euo pipefail
out="${1:-BENCH_FORCED_last.json}"

# the distributed-tier query set fixed by the r10 verdict: q40-q49
# (graph family), PageRank variants q94/q101, and q15 (modularity reads
# the same projection machinery)
ONLY=q40_kcore,q41_label_prop,q42_louvain,q43_connected_components
ONLY=$ONLY,q44_fastrp,q45_leiden,q46_density,q47_modularity_opt
ONLY=$ONLY,q48_hdbscan,q49_ep2_pipeline,q94_pagerank,q101_ppr,q15_modularity

SPARK_GRAFT_COLLECT_THRESHOLD=0 \
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_ONLY="$ONLY" \
SPARK_GRAFT_BENCH_MIRROR="$out" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '{"metric"' > "$out"
cat "$out"
