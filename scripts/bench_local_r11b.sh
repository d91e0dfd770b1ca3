#!/bin/bash
# Round-11 EXTENSION isolated map (one JVM per query, best-of-3, canonical
# sbt launcher): the post-close additions — versioned (generation-log)
# index faces, quality classifier, unigram tokenizer — plus two standing
# heavies for continuity with BENCH_LOCAL_r11.json.
set -u
OUT=${1:-/tmp/bench_local_r11b.txt}
: > "$OUT"
# (the *_contract siblings are verify-only by the Bench convention; their
# costs are visible in smoke_times.json and the stress receipts)
QUERIES="s_knn_versioned e_versioned_stream_ingest s_knn_ivfpq_versioned \
d_gate_versioned g_pagerank t_sparse_topk"
for q in $QUERIES; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_one_r11b.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench_one_r11b.log 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then echo "$q FAILED rc=$rc" >> "$OUT"; continue; fi
  python3 - "$q" "$OUT" <<'PY'
import json, sys
d = json.load(open('/tmp/bench_one_r11b.json'))
q, out = sys.argv[1], sys.argv[2]
v = d.get('queries', {}).get(q, -1)
open(out, 'a').write(f"{q} {v}\n")
PY
done
cat "$OUT"
