#!/bin/bash
# Round-13 second pass: re-run the rung artifacts invalidated by the
# a14/x08 spill-cliff fix (AdvancedQueries/PipelineQueries/
# Decontaminate are measured surface, so every committed audit's
# provenance stamp went stale). Same artifact set and order as
# tools/r13_gates.sh minus the gates whose surface did NOT change
# (ZIP rungs, streaming state, BENCH_sf1 re-run LAST — it needs an
# idle machine). STRICTLY SERIAL.
set -u
cd "$(dirname "$0")/.."
N=13
J=tools/jrun.sh
FAIL=()
run() { echo "[r13b] $(date +%H:%M:%S) $*" >&2; "$@" || FAIL+=("$1 $2 $3"); }
# Hardened post-ADVICE r13: audits write to a temp file and mv into
# place only on success — `run ... > out` truncated out before the
# JVM started, which is how a 0-byte sf80_heavy audit reached HEAD.
runj() { local out=$1; shift
  echo "[r13b] $(date +%H:%M:%S) $* > $out" >&2
  if "$@" > "$out.tmp"; then mv "$out.tmp" "$out"; else
    rm -f "$out.tmp"; FAIL+=("$out"); return 1; fi; }

# skew + heap drills (a14/x08 are in neither HEAP_Q nor skew's set,
# but the artifacts stamp the whole measured surface — refresh them)
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

# full-surface ladder on new HEAD
runj shuffle_audit_sf1.json $J graft.ShuffleAudit target/sfdata/sf1
SPARK_DRIVER_MEM=40g runj shuffle_audit_sf10.json $J graft.ShuffleAudit target/sfdata/sf10
SPARK_DRIVER_MEM=40g runj shuffle_audit_sf20.json $J graft.ShuffleAudit target/sfdata/sf20
run $J graft.ScaleCheck audits shuffle_audit_sf1.json shuffle_audit_sf10.json 10 "SCALE_r${N}.json" transition
run $J graft.ScaleCheck audits shuffle_audit_sf10.json shuffle_audit_sf20.json 2 "SCALE_r${N}_postcap.json" postcap

# mining rungs: sf40 residue + sf80 answers
MINING="d03_ngram_jaccard d04_minhash_lsh d13_semantic_clusters \
s03_embed_neardup s11_multiprobe_neardup"
SPARK_DRIVER_MEM=48g runj shuffle_audit_sf40.json $J graft.ShuffleAudit target/sfdata/sf40 $MINING
python3 - <<'PY' || FAIL+=("subset step" "" "")
import json
full = json.load(open('shuffle_audit_sf20.json'))
sub = {k: full[k] for k in json.load(open('shuffle_audit_sf40.json')) if not k.startswith('_')}
sub['_meta'] = full['_meta']
open('shuffle_audit_sf20_residue.json', 'w').write(json.dumps(sub))
PY
run $J graft.ScaleCheck audits shuffle_audit_sf20_residue.json shuffle_audit_sf40.json 2 "SCALE_r${N}_sf40.json" postcap
SPARK_DRIVER_MEM=48g runj shuffle_audit_sf80.json $J graft.ShuffleAudit target/sfdata/sf80 $MINING
run $J graft.ScaleCheck audits shuffle_audit_sf40.json shuffle_audit_sf80.json 2 "SCALE_r${N}_sf80.json" answers

# sf40 heavy (full 10)
HEAVY="g01_pagerank g03_bfs_reach a14_gap_fill q21_join5 p01_curate \
d12_repeated_spans q30_table_profile t23_window_pmi x08_source_overlap \
d07_dup_components"
SPARK_DRIVER_MEM=48g runj shuffle_audit_sf40_heavy.json $J graft.ShuffleAudit target/sfdata/sf40 $HEAVY
python3 - <<'PY' || FAIL+=("subset step" "" "")
import json
full = json.load(open('shuffle_audit_sf20.json'))
sub = {k: full[k] for k in json.load(open('shuffle_audit_sf40_heavy.json')) if not k.startswith('_')}
sub['_meta'] = full['_meta']
open('shuffle_audit_sf20_heavy.json', 'w').write(json.dumps(sub))
PY
run $J graft.ScaleCheck audits shuffle_audit_sf20_heavy.json shuffle_audit_sf40_heavy.json 2 "SCALE_r${N}_sf40_heavy.json" postcap

# sf80 heavy — THE rung this pass exists for: full four-query set on
# the fixed a14/x08 (the r13a run spilled 27.5/19.6 GB here and the
# disk-fill aborted g03/q21)
HEAVY80="g03_bfs_reach a14_gap_fill q21_join5 x08_source_overlap"
SPARK_DRIVER_MEM=64g runj shuffle_audit_sf80_heavy.json $J graft.ShuffleAudit target/sfdata/sf80 $HEAVY80
python3 - <<'PY' || FAIL+=("subset step" "" "")
import json
full = json.load(open('shuffle_audit_sf40_heavy.json'))
sub = {k: full[k] for k in json.load(open('shuffle_audit_sf80_heavy.json')) if not k.startswith('_')}
sub['_meta'] = full['_meta']
open('shuffle_audit_sf40_heavy4.json', 'w').write(json.dumps(sub))
PY
run $J graft.ScaleCheck audits shuffle_audit_sf40_heavy4.json shuffle_audit_sf80_heavy.json 2 "SCALE_r${N}_sf80_heavy.json" answers

# full-surface MemAudit deep-dive on new HEAD
SPARK_DRIVER_MEM=40g run $J graft.MemAudit target/sfdata/sf10 "MEM_r${N}.json"

# derive the README gate table from what actually exists
python3 tools/gate_table.py || FAIL+=("gate_table.py" "" "")

echo "[r13b] done; failures: ${#FAIL[@]}"
for f in "${FAIL[@]:-}"; do [ -n "$f" ] && echo "[r13b] FAILED: $f"; done
