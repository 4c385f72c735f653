#!/bin/bash
# Round-15 gate set: the FULL ladder re-run on the r15 measured
# surface (VERDICT r14 #1/#2 — the r14 width recalibration left every
# sf20+ audit stale, and r15 additionally restructures the d03/s03/x08
# df-cap into a window riding the anchor, so every rung must re-run),
# plus the r14 extras that never executed (sf160, g03 sf80, ZIP
# many-tiny-archives), plus the min-across-runs sf1 bench discipline
# (VERDICT r14 #4: two serial runs, elementwise min committed as
# BENCH_sf1_min.json, gate compares against the r14 boundary).
# Each phase commits its artifacts so an end-of-round snapshot is
# coherent at any cut point. STRICTLY SERIAL.
#
# ADVICE r14 (medium): bench artifacts are produced via an exit-status
# gate — a failed graft.Bench run skips the head/bench_gate/commit
# steps instead of shipping a stale bench_out.json under a fresh name.
set -u
cd "$(dirname "$0")/.."
N=15
J=tools/jrun.sh
FAIL=()
run() { echo "[r15p] $(date +%H:%M:%S) $*" >&2; "$@" || FAIL+=("$1 $2"); }
runj() { local out=$1; shift
  echo "[r15p] $(date +%H:%M:%S) $* > $out" >&2
  if "$@" > "$out.tmp"; then mv "$out.tmp" "$out"; else
    rm -f "$out.tmp"; FAIL+=("$out"); return 1; fi; }
subset() { python3 - "$1" "$2" "$3" <<'PY' || FAIL+=("subset $3")
import json, sys
full = json.load(open(sys.argv[1]))
names = [k for k in json.load(open(sys.argv[2])) if not k.startswith('_')]
missing = [n for n in names if n not in full]
assert not missing, f'{sys.argv[1]} lacks {missing}'
sub = {k: full[k] for k in names}
sub['_meta'] = full['_meta']
open(sys.argv[3], 'w').write(json.dumps(sub))
PY
}
ckpt() { python3 tools/gate_table.py >/dev/null 2>&1
  git add -A && git commit -q -m "$1" && echo "[r15p] committed: $1" >&2; }
# graft.Bench writes bench_out.json (which belongs to the DRIVER's
# run — save/restore around ours) and exits nonzero on failure; only
# a successful fresh run may be renamed into an sf1 artifact.
bench_sf1() { local out=$1
  echo "[r15p] $(date +%H:%M:%S) graft.Bench sf1 -> $out" >&2
  [ -f bench_out.json ] && cp bench_out.json /tmp/bench_out.driver.bak
  local ok=0
  rm -f bench_out.json
  if SPARK_GRAFT_SF_DIR=target/sfdata/sf1 SPARK_GRAFT_CPUS=32 $J graft.Bench \
      && [ -s bench_out.json ]; then
    head -1 bench_out.json > "$out"; ok=1
  else
    FAIL+=("bench:$out")
  fi
  [ -f /tmp/bench_out.driver.bak ] && mv /tmp/bench_out.driver.bak bench_out.json
  [ "$ok" = 1 ]
}

# ---- phase 1: sf1 bench run A + tripwire vs the r14 round boundary
git show HEAD:BENCH_sf1.json > /tmp/bench_sf1_r14round.json 2>/dev/null
if bench_sf1 BENCH_sf1.json; then
  cp BENCH_sf1.json /tmp/bench_sf1_runA.json
  python3 tools/bench_gate.py /tmp/bench_sf1_r14round.json BENCH_sf1.json \
    --round=$N --out="BENCHGATE_r${N}.json" \
    || FAIL+=("bench_gate runA (attribute in PLANS.md)")
  ckpt "Round-15 BENCH_sf1 run A on the window-capped mining plans + tripwire vs r14"
fi

# ---- phase 2: the core ladder on the r15 plans
runj shuffle_audit_sf1.json $J graft.ShuffleAudit target/sfdata/sf1
SPARK_DRIVER_MEM=40g runj shuffle_audit_sf10.json $J graft.ShuffleAudit target/sfdata/sf10
SPARK_DRIVER_MEM=40g runj shuffle_audit_sf20.json $J graft.ShuffleAudit target/sfdata/sf20
run $J graft.ScaleCheck audits shuffle_audit_sf1.json shuffle_audit_sf10.json 10 "SCALE_r${N}.json" transition
run $J graft.ScaleCheck audits shuffle_audit_sf10.json shuffle_audit_sf20.json 2 "SCALE_r${N}_postcap.json" postcap
ckpt "Round-15 core ladder: sf1/sf10/sf20 audits + transition/postcap gates on the window-capped plans"

# ---- phase 3: per-task state deep-dive
SPARK_DRIVER_MEM=40g run $J graft.MemAudit target/sfdata/sf10 "MEM_r${N}.json"
ckpt "Round-15 MemAudit at sf10"

# ---- phase 4: mining rungs at sf40/sf80 (the window cap at scale)
MINING="d03_ngram_jaccard d04_minhash_lsh d13_semantic_clusters \
s03_embed_neardup s11_multiprobe_neardup"
SPARK_DRIVER_MEM=48g runj shuffle_audit_sf40.json $J graft.ShuffleAudit target/sfdata/sf40 $MINING
subset shuffle_audit_sf20.json shuffle_audit_sf40.json shuffle_audit_sf20_residue.json
run $J graft.ScaleCheck audits shuffle_audit_sf20_residue.json shuffle_audit_sf40.json 2 "SCALE_r${N}_sf40.json" postcap
SPARK_DRIVER_MEM=48g runj shuffle_audit_sf80.json $J graft.ShuffleAudit target/sfdata/sf80 $MINING
run $J graft.ScaleCheck audits shuffle_audit_sf40.json shuffle_audit_sf80.json 2 "SCALE_r${N}_sf80.json" answers
ckpt "Round-15 mining rungs sf40/sf80: the window df cap at the scales it protects"

# ---- phase 5: heavy rungs (incl. g03's sf80 datapoint)
HEAVY="g01_pagerank g03_bfs_reach a14_gap_fill q21_join5 p01_curate \
d12_repeated_spans q30_table_profile t23_window_pmi x08_source_overlap \
d07_dup_components"
SPARK_DRIVER_MEM=48g runj shuffle_audit_sf40_heavy.json $J graft.ShuffleAudit target/sfdata/sf40 $HEAVY
subset shuffle_audit_sf20.json shuffle_audit_sf40_heavy.json shuffle_audit_sf20_heavy.json
run $J graft.ScaleCheck audits shuffle_audit_sf20_heavy.json shuffle_audit_sf40_heavy.json 2 "SCALE_r${N}_sf40_heavy.json" postcap
HEAVY80="g03_bfs_reach a14_gap_fill q21_join5 x08_source_overlap"
SPARK_DRIVER_MEM=64g runj shuffle_audit_sf80_heavy.json $J graft.ShuffleAudit target/sfdata/sf80 $HEAVY80
subset shuffle_audit_sf40_heavy.json shuffle_audit_sf80_heavy.json shuffle_audit_sf40_heavy4.json
run $J graft.ScaleCheck audits shuffle_audit_sf40_heavy4.json shuffle_audit_sf80_heavy.json 2 "SCALE_r${N}_sf80_heavy.json" answers
ckpt "Round-15 heavy rungs sf40/sf80 incl. g03's sf80 datapoint"

# ---- phase 6: sf160 answers rung (third time prepped — RUN IT FIRST
# among the extras; the model at a scale it was not tuned on)
RUNG_ROUND=$N bash tools/sf160_rung.sh || FAIL+=("sf160_rung")
ckpt "Round-15 sf160 answers rung"

# ---- phase 7: skew + heap + spill + streaming state + ZIP (+ tiny point)
[ -d target/sfdata/sf10skew ] || run $J graft.ScaleGen target/sfdata/sf10 target/sfdata/sf10skew 1 all skew
run $J graft.SkewDrill target/sfdata/sf10 target/sfdata/sf10skew "SKEW_r${N}.json"
HEAP_Q="d03_ngram_jaccard d07_dup_components d12_repeated_spans \
d13_semantic_clusters g01_pagerank g03_bfs_reach g04_link_predict \
g05_jaccard_predict a14_gap_fill s03_embed_neardup"
SPARK_DRIVER_MEM=8g SPARK_GRAFT_CPUS=8 \
  run $J graft.HeapDrill target/sfdata/sf20 "MEMBOUND_r${N}.json" $HEAP_Q
SPARK_DRIVER_MEM=4g SPARK_GRAFT_CPUS=8 \
  run $J graft.HeapDrill spill target/sfdata/sf20 "MEMBOUND_r${N}_spill.json" \
  "MEMBOUND_r${N}.json" $HEAP_Q
[ -d target/sfdata/vol10 ] || run $J graft.ScaleGen /root/testdata/sf0.1 target/sfdata/vol10 10 all volume
SQ="e05_stream_sessionize e06_stream_windows e07_stream_range_join \
e10_stream_funnel e11_stream_heavy_users e13_stream_sliding \
e15_stream_session_window e16_stream_dq e17_stream_zone_maps \
e18_stream_window_users d06_stream_dedup d08_stream_novel x21_stream_upsert"
run $J graft.StateAudit /root/testdata/sf0.1 target/sfdata/sf1 14.0 "STATE_r${N}_scale.json" $SQ
run $J graft.StateAudit /root/testdata/sf0.1 target/sfdata/vol10 1.5 "STATE_r${N}_volume.json" \
  $(echo $SQ | sed 's/e07_stream_range_join/e07_stream_range_join:15.0/')
run $J graft.ZipScaleBench "ZIPBENCH_r${N}.json"
run $J graft.ZipScaleBench multi "ZIPBENCH_r${N}_multi.json"
run $J graft.ZipScaleBench latency "ZIPBENCH_r${N}_latency.json"
run $J graft.ZipScaleBench latency "ZIPBENCH_r${N}_tiny.json" 4096 8 24 30
ckpt "Round-15 skew/heap/spill/streaming-state/ZIP rungs (incl. many-tiny-archives latency point)"

# ---- phase 8: sf1 bench run B (hours after run A by construction) +
# elementwise min + the canonical min-vs-baseline tripwire
if bench_sf1 /tmp/bench_sf1_runB.json; then
  cp /tmp/bench_sf1_runB.json BENCH_sf1_runB.json
  python3 tools/bench_min.py BENCH_sf1_min.json \
    /tmp/bench_sf1_runA.json /tmp/bench_sf1_runB.json \
    || FAIL+=("bench_min")
  python3 tools/bench_gate.py /tmp/bench_sf1_r14round.json BENCH_sf1_min.json \
    --round=$N --out="BENCHGATE_r${N}.json" \
    || FAIL+=("bench_gate min (attribute in PLANS.md)")
  ckpt "Round-15 BENCH_sf1 run B + elementwise-min artifact; BENCHGATE now min-vs-r14"
fi

echo "[r15p] done; failures: ${#FAIL[@]}"
for f in "${FAIL[@]:-}"; do [ -n "$f" ] && echo "[r15p] FAILED: $f"; done
