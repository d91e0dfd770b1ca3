#!/bin/bash
# Isolated best-of-3 per query (one JVM per query, canonical sbt launcher) —
# the round-close BENCH_LOCAL recipe. Output: one line per query appended to
# $OUT as "name seconds".
#
# r11 selection: the round's new queries (persisted BM25 probe/append,
# indexed hybrid, trigram LM + its buckets, PQ retrain, index health
# audits), the queries whose implementation changed (two-level perplexity
# buckets; t_bm25_topk + s_hybrid_retrieval share the refactored
# bm25Contrib expression), and the standing heavy faces for
# round-over-round continuity.
set -u
OUT=${1:-/tmp/bench_local_r11.txt}
: > "$OUT"
QUERIES="s_bm25_indexed s_bm25_appended s_hybrid_indexed t_bm25_topk \
s_hybrid_retrieval t_perplexity_buckets t_perplexity_buckets_tri \
t_lm_trigram s_knn_ivfpq_retrained d_index_health d_substr_index_health \
d_composed3_gate d_composed_gate d_substr_gate d_stream_gate \
s_semantic_gate g_pagerank s_knn_retrained s_knn_purge_readd t_sparse_topk"
for q in $QUERIES; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_one_r11.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench_one_r11.log 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then echo "$q ERROR rc=$rc" >> "$OUT"; continue; fi
  python3 - "$q" >> "$OUT" <<'EOF'
import json, sys
b = json.load(open('/tmp/bench_one_r11.json'))
q = sys.argv[1]
print(q, b['queries'][q])
EOF
done
echo DONE >> "$OUT"
