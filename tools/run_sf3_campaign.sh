#!/bin/bash
# Round-14 sf3 full-catalog crossover campaign (VERDICT r13 item 1):
# min-of-2 per leg, RUN-LEVEL INTERLEAVED (plainA -> routedA -> plainB
# -> routedB) so slow host drift cannot favor one leg, merged with
# bench_merge (equal pass counts per leg -> no asymmetric_passes
# warning), then crossover_report for the control-corrected ratio.
set -euo pipefail
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf3
export SPARK_DRIVER_MEMORY=32g
B=.benchmarks

echo "=== plain run A ==="
python bench.py --repeat 1
cp $B/bench_sf3.json $B/bench_sf3_runA.json
echo "=== routed run A ==="
SPARK_GRAFT_BUCKETED=1 SPARK_GRAFT_HYBRID=1 python bench.py --repeat 1
cp $B/bench_sf3_routed_hybrid.json $B/bench_sf3_routed_hybrid_runA.json
echo "=== plain run B ==="
python bench.py --repeat 1
cp $B/bench_sf3.json $B/bench_sf3_runB.json
echo "=== routed run B ==="
SPARK_GRAFT_BUCKETED=1 SPARK_GRAFT_HYBRID=1 python bench.py --repeat 1
cp $B/bench_sf3_routed_hybrid.json $B/bench_sf3_routed_hybrid_runB.json

echo "=== merge + crossover ==="
python tools/bench_merge.py $B/bench_sf3.json $B/bench_sf3_runA.json $B/bench_sf3_runB.json
python tools/bench_merge.py $B/bench_sf3_routed_hybrid.json $B/bench_sf3_routed_hybrid_runA.json $B/bench_sf3_routed_hybrid_runB.json
python tools/crossover_report.py $B/bench_sf3.json $B/bench_sf3_routed_hybrid.json | tee $B/crossover_sf3.json
echo "=== CAMPAIGN DONE ==="
