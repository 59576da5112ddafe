#!/bin/bash
# Round-15 sf3 campaign part 3 (VERDICT r14 item 7): a THIRD
# interleaved pass per leg (plainC -> routedC), merged into min-of-3,
# to shrink the control-group noise band (r14's spanned 0.28x-3.4x)
# the control-corrected crossover ratio rests on.
#
# Run C covers the SAME 176-query set as runs A/B via --only: the
# round-15 catalog adds r79_streaming_heavyhitters, and bench_merge
# (correctly) refuses to merge artifacts over different query sets.
# Note r78 was shaved this round (single-batch fold + one checkpoint);
# both legs of run C get the identical speedup, so the plain-vs-routed
# ratio is unaffected — recorded in SCALE.md §Round-15.
set -euo pipefail
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf3
export SPARK_DRIVER_MEMORY=32g
B=.benchmarks

NAMES=$(python - <<'PY'
import json
with open(".benchmarks/bench_sf3_runA.json") as f:
    print(",".join(sorted(json.load(f)["queries"])))
PY
)

run_pass () { # $1 = label, $2 = routed(0/1), $3 = copy-to
  for attempt in 1 2; do
    echo "=== $1 attempt $attempt ==="
    rc=0
    if [ "$2" = "1" ]; then
      SPARK_GRAFT_BUCKETED=1 SPARK_GRAFT_HYBRID=1 python bench.py --repeat 1 --only "$NAMES" || rc=$?
      src=$B/bench_sf3_routed_hybrid_subset.json
    else
      python bench.py --repeat 1 --only "$NAMES" || rc=$?
      src=$B/bench_sf3_subset.json
    fi
    if [ $rc -eq 0 ]; then cp "$src" "$B/$3"; return 0; fi
    echo "=== $1 attempt $attempt FAILED rc=$rc ==="
  done
  return 1
}

run_pass "plain run C" 0 bench_sf3_runC.json || exit 1
run_pass "routed run C" 1 bench_sf3_routed_hybrid_runC.json || exit 1

echo "=== merge + crossover (min-of-3) ==="
python tools/bench_merge.py $B/bench_sf3.json $B/bench_sf3_runA.json $B/bench_sf3_runB.json $B/bench_sf3_runC.json
python tools/bench_merge.py $B/bench_sf3_routed_hybrid.json $B/bench_sf3_routed_hybrid_runA.json $B/bench_sf3_routed_hybrid_runB.json $B/bench_sf3_routed_hybrid_runC.json
python tools/crossover_report.py $B/bench_sf3.json $B/bench_sf3_routed_hybrid.json | tee $B/crossover_sf3.json
echo "=== CAMPAIGN PART 3 DONE ==="
