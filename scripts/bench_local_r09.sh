#!/bin/bash
# Isolated best-of-3 per query (one JVM per query, canonical sbt launcher) —
# the round-close BENCH_LOCAL recipe. Output: one line per query appended to
# $OUT as "name seconds".
set -u
OUT=${1:-/tmp/bench_local_r09.txt}
: > "$OUT"
QUERIES="s_knn_ivfpq_exact s_knn_ivfpq e_stream_join g_pagerank j18_golden \
t_sparse_topk d_keepers_quality e_stream_dedup s_knn_pq_exact s_knn_pq \
t_cms_merge s_knn_ivf_exact e_stream_sessionize d_bloom_sound t_pack_slices \
s_knn_ivfpq_deleted s_knn_indexed_deleted t_temperature_mix t_bpe_encode \
e_stream_index_append"
for q in $QUERIES; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_one_r09.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench_one_r09.log 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then echo "$q ERROR rc=$rc" >> "$OUT"; continue; fi
  python3 - "$q" >> "$OUT" <<'EOF'
import json, sys
b = json.load(open('/tmp/bench_one_r09.json'))
q = sys.argv[1]
print(q, b['queries'][q])
EOF
done
echo DONE >> "$OUT"
