#!/bin/bash
# Isolated best-of-3 per query (one JVM per query, canonical sbt launcher) —
# the round-close BENCH_LOCAL recipe. Output: one line per query appended to
# $OUT as "name seconds".
set -u
OUT=${1:-/tmp/bench_local_r10.txt}
: > "$OUT"
QUERIES="d_composed_gate e_stream_join d_stream_gate s_semantic_gate \
g_pagerank j18_golden t_sparse_topk s_knn_ivfpq s_knn_ivfpq_exact \
d_cc_altstar s_knn_pq d_keepers_quality m_audio_dims s_knn_ivf t_cms_merge \
s_knn_purge_readd s_knn_retrained e_stream_index_append s_knn_indexed_deleted \
t_bpe_encode"
for q in $QUERIES; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_one_r10.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench_one_r10.log 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then echo "$q ERROR rc=$rc" >> "$OUT"; continue; fi
  python3 - "$q" >> "$OUT" <<'EOF'
import json, sys
b = json.load(open('/tmp/bench_one_r10.json'))
q = sys.argv[1]
print(q, b['queries'][q])
EOF
done
echo DONE >> "$OUT"
