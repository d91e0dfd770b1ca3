#!/bin/bash
# Isolated best-of-3 per query (one JVM per query, canonical sbt launcher) —
# the round-close BENCH_LOCAL recipe. Output: one line per query appended to
# $OUT as "name seconds".
#
# r12 selection: every query whose implementation changed under the
# unified generation-log lifecycle (the persisted IVF / IVF-PQ / near-dup /
# substring faces now delegate to the Versioned* implementations), the
# round's new composed4 gate, and the standing heavy faces for
# round-over-round continuity.
set -u
OUT=${1:-/tmp/bench_local_r12.txt}
: > "$OUT"
QUERIES="s_knn_indexed s_knn_indexed_deleted s_knn_indexed_incremental \
s_knn_retrained s_knn_purge_readd s_knn_versioned s_knn_ivfpq_indexed \
s_knn_ivfpq_deleted s_knn_ivfpq_retrained s_knn_ivfpq_versioned \
e_stream_index_append e_versioned_stream_ingest \
d_stream_gate d_substr_gate d_substr_clean d_substr_incremental \
d_gate_versioned s_semantic_gate d_composed_gate d_composed3_gate \
d_composed4_gate d_index_health d_substr_index_health \
g_pagerank t_sparse_topk a3_count"
for q in $QUERIES; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_one_r12.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench_one_r12.log 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then echo "$q ERROR rc=$rc" >> "$OUT"; continue; fi
  python3 - "$q" >> "$OUT" <<'EOF'
import json, sys
b = json.load(open('/tmp/bench_one_r12.json'))
q = sys.argv[1]
print(q, b["queries"].get(q, -1))
EOF
done
cat "$OUT"
