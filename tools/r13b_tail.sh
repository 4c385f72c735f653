#!/bin/bash
# Reordered tail of tools/r13b_gates.sh (wall-budget triage): the
# sf40/sf80 HEAVY rungs — the artifact the a14/x08 spill fix exists
# for — run FIRST, mining rungs second, MemAudit last, so a session
# wall cuts the least important evidence. Resumes after the sf20
# full-surface audit + its two gates have been produced.
set -u
cd "$(dirname "$0")/.."
N=13
J=tools/jrun.sh
FAIL=()
run() { echo "[r13b-tail] $(date +%H:%M:%S) $*" >&2; "$@" || FAIL+=("$1 $2 $3"); }

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

# mining sf40 audit + SCALE_r13_sf40 were already produced by the
# killed r13b_gates.sh run before the reorder took over
MINING="d03_ngram_jaccard d04_minhash_lsh d13_semantic_clusters \
s03_embed_neardup s11_multiprobe_neardup"
SPARK_DRIVER_MEM=48g run $J graft.ShuffleAudit target/sfdata/sf80 $MINING \
  > shuffle_audit_sf80.json
run $J graft.ScaleCheck audits shuffle_audit_sf40.json shuffle_audit_sf80.json 2 "SCALE_r${N}_sf80.json" answers

SPARK_DRIVER_MEM=40g run $J graft.MemAudit target/sfdata/sf10 "MEM_r${N}.json"

python3 tools/gate_table.py || FAIL+=("gate_table.py" "" "")

echo "[r13b-tail] done; failures: ${#FAIL[@]}"
for f in "${FAIL[@]:-}"; do [ -n "$f" ] && echo "[r13b-tail] FAILED: $f"; done
