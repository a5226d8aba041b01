#!/bin/sh
# Round-3 hardware window: run every pending TPU task sequentially, each
# logged to its own file (NOT through a pipe — rig note: grep buffering +
# timeout loses output).  Keep going on individual failures.
cd "$(dirname "$0")/.." || exit 1
mkdir -p benches/logs
echo "start $(date)" | tee benches/logs/hw_window_r3.status

run() {
  name=$1; tmo=$2; shift 2
  echo "== $name start $(date)" >> benches/logs/hw_window_r3.status
  timeout "$tmo" "$@" > "benches/logs/${name}_r3.log" 2>&1
  echo "== $name exit=$? $(date)" >> benches/logs/hw_window_r3.status
}

run tpu_test_all 5400 python benches/tpu_test_all.py
run hw_spot      2400 python benches/hw_spot_r3.py
run run_suite    5400 python benches/run_suite.py
run ablate       4800 python benches/ablate_radix16.py 24 --pairs
run bench        2400 python bench.py
echo "done $(date)" >> benches/logs/hw_window_r3.status
