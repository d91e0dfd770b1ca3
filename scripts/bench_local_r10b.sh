#!/bin/bash
# Post-close additions: isolated best-of-3 per query, one JVM per query —
# same recipe as bench_local_r10.sh, covering the session's new faces.
set -u
OUT=${1:-/tmp/bench_local_r10b.txt}
: > "$OUT"
QUERIES="d_substr_spans d_substr_clean d_substr_incremental d_substr_gate \
t_dsir_weights t_dsir_hashed t_dsir_sample s_prototype_prune t_bm25_topk \
s_hybrid_retrieval d_composed3_gate s_knn_drift_contract"
for q in $QUERIES; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_one_r10b.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench_one_r10b.log 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then echo "$q ERROR rc=$rc" >> "$OUT"; continue; fi
  python3 - "$q" >> "$OUT" <<'PYEOF'
import json, sys
b = json.load(open('/tmp/bench_one_r10b.json'))
q = sys.argv[1]
print(q, b['queries'][q])
PYEOF
done
echo DONE >> "$OUT"
