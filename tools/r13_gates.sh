#!/bin/bash
# Round-13 gate order: same artifact set as round_gates.sh, reordered
# so the round's promised-but-never-run gates (spill drill, ZIP rungs,
# streaming state refresh — VERDICT r12 #2/#3/#6) land FIRST, the
# multi-hour scale ladder after, and the new sf80 heavy rung (VERDICT
# r12 #8) runs TRIMMED to the four likeliest-to-break queries so the
# round fits its wall. STRICTLY SERIAL (two Spark JVMs corrupt timing).
set -u
cd "$(dirname "$0")/.."
N=13
J=tools/jrun.sh
FAIL=()
run() { echo "[r13] $(date +%H:%M:%S) $*" >&2; "$@" || FAIL+=("$1 $2 $3"); }

# --- quick wins: the three artifact sets r12 never produced ---------
run $J graft.ZipScaleBench "ZIPBENCH_r${N}.json"
run $J graft.ZipScaleBench multi "ZIPBENCH_r${N}_multi.json"
run $J graft.ZipScaleBench latency "ZIPBENCH_r${N}_latency.json"

SQ="e05_stream_sessionize e06_stream_windows e07_stream_range_join \
e10_stream_funnel e11_stream_heavy_users e13_stream_sliding \
e15_stream_session_window e16_stream_dq e17_stream_zone_maps \
e18_stream_window_users d06_stream_dedup d08_stream_novel x21_stream_upsert"
[ -d target/sfdata/vol10 ] || run $J graft.ScaleGen /root/testdata/sf0.1 target/sfdata/vol10 10 all volume
run $J graft.StateAudit /root/testdata/sf0.1 target/sfdata/sf1 14.0 "STATE_r${N}_scale.json" $SQ
run $J graft.StateAudit /root/testdata/sf0.1 target/sfdata/vol10 1.5 "STATE_r${N}_volume.json" \
  $(echo $SQ | sed 's/e07_stream_range_join/e07_stream_range_join:15.0/')

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

# --- BENCH_sf1 refresh on HEAD (VERDICT r12 #5): the pin's sf1
# justification was one round stale. graft.Bench side-writes
# bench_out.json in cwd (driver owns it) — save/restore around it ----
cp bench_out.json /tmp/bench_out_driver_save.json
SPARK_GRAFT_SF_DIR=target/sfdata/sf1 SPARK_GRAFT_CPUS=32 \
  run $J graft.Bench
head -1 bench_out.json > BENCH_sf1.json
cp /tmp/bench_out_driver_save.json bench_out.json

# --- the scale ladder (planted-offset fix touched the measured surface,
# so every rung re-runs on HEAD; provenance gate enforces it) --------
run $J graft.ShuffleAudit target/sfdata/sf1  > shuffle_audit_sf1.json
SPARK_DRIVER_MEM=40g run $J graft.ShuffleAudit target/sfdata/sf10 > shuffle_audit_sf10.json
SPARK_DRIVER_MEM=40g run $J graft.ShuffleAudit target/sfdata/sf20 > shuffle_audit_sf20.json
run $J graft.ScaleCheck audits shuffle_audit_sf1.json shuffle_audit_sf10.json 10 "SCALE_r${N}.json" transition
run $J graft.ScaleCheck audits shuffle_audit_sf10.json shuffle_audit_sf20.json 2 "SCALE_r${N}_postcap.json" postcap

# --- mining rungs: sf40 residue + sf80 answers ----------------------
MINING="d03_ngram_jaccard d04_minhash_lsh d13_semantic_clusters \
s03_embed_neardup s11_multiprobe_neardup"
run $J graft.ShuffleAudit target/sfdata/sf40 $MINING > shuffle_audit_sf40.json
python3 - <<'PY'
import json
full = json.load(open('shuffle_audit_sf20.json'))
sub = {k: full[k] for k in json.load(open('shuffle_audit_sf40.json'))}
open('shuffle_audit_sf20_residue.json', 'w').write(json.dumps(sub))
PY
run $J graft.ScaleCheck audits shuffle_audit_sf20_residue.json shuffle_audit_sf40.json 2 "SCALE_r${N}_sf40.json" postcap
SPARK_DRIVER_MEM=48g run $J graft.ShuffleAudit target/sfdata/sf80 $MINING \
  > shuffle_audit_sf80.json
run $J graft.ScaleCheck audits shuffle_audit_sf40.json shuffle_audit_sf80.json 2 "SCALE_r${N}_sf80.json" answers

# --- sf40 heavy (full 10) -------------------------------------------
HEAVY="g01_pagerank g03_bfs_reach a14_gap_fill q21_join5 p01_curate \
d12_repeated_spans q30_table_profile t23_window_pmi x08_source_overlap \
d07_dup_components"
SPARK_DRIVER_MEM=48g run $J graft.ShuffleAudit target/sfdata/sf40 $HEAVY \
  > shuffle_audit_sf40_heavy.json
python3 - <<'PY'
import json
full = json.load(open('shuffle_audit_sf20.json'))
sub = {k: full[k] for k in json.load(open('shuffle_audit_sf40_heavy.json'))}
open('shuffle_audit_sf20_heavy.json', 'w').write(json.dumps(sub))
PY
run $J graft.ScaleCheck audits shuffle_audit_sf20_heavy.json shuffle_audit_sf40_heavy.json 2 "SCALE_r${N}_sf40_heavy.json" postcap

# --- sf80 heavy, trimmed (VERDICT r12 #8): the four most at-risk —
# x08 at 63% of state budget at sf40, g03's 12.6 GB task-view shuffle,
# a14's pinned grid exchange at 2.0x, q21's 5-way fact join ----------
[ -f target/sfdata/sf80/lineitem.parquet/_SUCCESS ] || \
  run $J graft.ScaleGen target/sfdata/sf40 target/sfdata/sf80 2 \
    orders,lineitem,customer,supplier,part,nation,region,events
HEAVY80="g03_bfs_reach a14_gap_fill q21_join5 x08_source_overlap"
SPARK_DRIVER_MEM=64g run $J graft.ShuffleAudit target/sfdata/sf80 $HEAVY80 \
  > shuffle_audit_sf80_heavy.json
python3 - <<'PY'
import json
full = json.load(open('shuffle_audit_sf40_heavy.json'))
sub = {k: full[k] for k in json.load(open('shuffle_audit_sf80_heavy.json'))}
open('shuffle_audit_sf40_heavy4.json', 'w').write(json.dumps(sub))
PY
run $J graft.ScaleCheck audits shuffle_audit_sf40_heavy4.json shuffle_audit_sf80_heavy.json 2 "SCALE_r${N}_sf80_heavy.json" answers

# --- full-surface MemAudit deep-dive on HEAD (VERDICT r12 #7): the
# amplification/projection detector last swept all 172 plans on r11
# code; r12 changed mining exchanges, r13 the planted offsets --------
SPARK_DRIVER_MEM=40g run $J graft.MemAudit target/sfdata/sf10 "MEM_r${N}.json"

# --- derive the README gate table from what actually exists ---------
python3 tools/gate_table.py || FAIL+=("gate_table.py" "" "")

echo "[r13] done; failures: ${#FAIL[@]}"
for f in "${FAIL[@]:-}"; do [ -n "$f" ] && echo "[r13] FAILED: $f"; done
