#!/bin/bash
# Round-14 one-off rungs beyond tools/round_gates.sh, in order:
#  1. ZIP many-tiny-archives latency point (VERDICT r13 #8): 4096
#     archives x 8 entries at 30 ms RTT — the 100k-tiny-archives shape
#     that motivated executor-side planning, previously uncharged.
#  2. g03 sf40->sf80 rung (ADVICE r13): the sf80 datapoint the r13a
#     disk-fill aborted.
#  3. sf80->sf160 answers rung on the r14 mining widths — the model
#     recalibration tested at a scale it was not tuned on.
# STRICTLY SERIAL with other JVMs.
set -u
cd "$(dirname "$0")/.."
J=tools/jrun.sh
FAIL=()
run() { echo "[r14x] $(date +%H:%M:%S) $*" >&2; "$@" || FAIL+=("$1 $2"); }

run $J graft.ZipScaleBench latency "ZIPBENCH_r14_tiny.json" 4096 8 24 30

run bash tools/g03_sf80_rung.sh
run bash tools/sf160_rung.sh

echo "[r14x] done; failures: ${#FAIL[@]}"
for f in "${FAIL[@]:-}"; do [ -n "$f" ] && echo "[r14x] FAILED: $f"; done
