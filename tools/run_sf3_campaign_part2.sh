#!/bin/bash
# Part 2 of the round-14 sf3 campaign: the B passes (the plain-B JVM
# died mid-pass on the first attempt — RPC endpoint gone, no OOM in
# dmesg, pass A of both legs green at identical settings, so treated
# as a host blip). Each pass retries once; a pass only counts if
# bench.py exits 0 (a dead-JVM pass records ConnectionRefused rows
# and must not be merged).
set -uo pipefail
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf3
export SPARK_DRIVER_MEMORY=32g
B=.benchmarks

run_pass () { # $1 = label, $2 = routed(0/1), $3 = artifact, $4 = copy-to
  for attempt in 1 2; do
    echo "=== $1 attempt $attempt ==="
    if [ "$2" = "1" ]; then
      SPARK_GRAFT_BUCKETED=1 SPARK_GRAFT_HYBRID=1 python bench.py --repeat 1
    else
      python bench.py --repeat 1
    fi
    rc=$?
    if [ $rc -eq 0 ]; then cp "$B/$3" "$B/$4"; return 0; fi
    echo "=== $1 attempt $attempt FAILED rc=$rc ==="
  done
  return 1
}

run_pass "plain run B" 0 bench_sf3.json bench_sf3_runB.json || exit 1
run_pass "routed run B" 1 bench_sf3_routed_hybrid.json bench_sf3_routed_hybrid_runB.json || exit 1

echo "=== merge + crossover ==="
python tools/bench_merge.py $B/bench_sf3.json $B/bench_sf3_runA.json $B/bench_sf3_runB.json
python tools/bench_merge.py $B/bench_sf3_routed_hybrid.json $B/bench_sf3_routed_hybrid_runA.json $B/bench_sf3_routed_hybrid_runB.json
python tools/crossover_report.py $B/bench_sf3.json $B/bench_sf3_routed_hybrid.json | tee $B/crossover_sf3.json
echo "=== CAMPAIGN DONE ==="
