#!/bin/bash
# Round-15c (optimization round 1): refresh the scale evidence the
# optimization diff invalidated. The r15/r15b artifacts are stamped on
# the pre-optimization tree (7ecfa97...) and ScaleCheck's provenance
# gate would refuse them against HEAD — the r14 lesson is that evidence
# must move WITH the code, so the rungs that cover the touched plans
# (q30 stack-profile, t23 one-scan PMI, d07/d13 ConnectedComponents)
# re-run here on the committed optimization tree.
#
# target/sfdata was lost to an external cleanup between sessions, so
# phase 0 regenerates the chain (deterministic — ScaleGen is pure shard
# arithmetic, same outputs as every earlier round).
#
# Scope decisions (documented in OPTIMIZATION_r15.md):
#  - full-surface sf1/sf10/sf20 audits took the prior session ~2 h; the
#    optimization diff changes exactly four query plans, so the ladder
#    here is the TOUCHED SUBSET + the mining family (d13 rides it), the
#    same shape r15b used for its fix.
#  - d07/t23/q30 stop at the rungs they historically had (q30 sf10,
#    d07/t23 sf20 — heavy-rung coverage); the mining family runs the
#    full sf1→sf160 ladder incl. the rung that caught the d13 spill.
# STRICTLY SERIAL.
set -u
cd "$(dirname "$0")/.."
J=tools/jrun.sh
FAIL=()
run() { echo "[r15c] $(date +%H:%M:%S) $*" >&2; "$@" || FAIL+=("$1 $2"); }
runj() { local out=$1; shift
  echo "[r15c] $(date +%H:%M:%S) $* > $out" >&2
  if "$@" > "$out.tmp"; then mv "$out.tmp" "$out"; else
    rm -f "$out.tmp"; FAIL+=("$out"); return 1; fi; }
subset() { python3 - "$1" "$2" "$3" <<'PY' || FAIL+=("subset $3")
import json, sys
full = json.load(open(sys.argv[1]))
names = sys.argv[2].split(',')
missing = [n for n in names if n not in full]
assert not missing, f'{sys.argv[1]} lacks {missing}'
sub = {k: full[k] for k in names}
sub['_meta'] = full['_meta']
open(sys.argv[3], 'w').write(json.dumps(sub))
PY
}
ckpt() { python3 tools/gate_table.py >/dev/null 2>&1
  git add -A && git commit -q -m "$1" && echo "[r15c] committed: $1" >&2; }

M="d03_ngram_jaccard d04_minhash_lsh d13_semantic_clusters \
s03_embed_neardup s11_multiprobe_neardup"
TOUCHED_WIDE="$M d07_dup_components t23_window_pmi q30_table_profile"
TOUCHED_20="$M d07_dup_components t23_window_pmi"
M_CSV=$(echo $M | tr ' ' ',')
T20_CSV=$(echo $TOUCHED_20 | tr ' ' ',')

# ---- phase 0: regenerate the rung data (lost with target/)
[ -f target/sfdata/sf1/documents.parquet/_SUCCESS ] || \
  run $J graft.ScaleGen /root/testdata/sf0.1 target/sfdata/sf1 10 all
[ -f target/sfdata/sf10/documents.parquet/_SUCCESS ] || \
  SPARK_DRIVER_MEM=40g run $J graft.ScaleGen target/sfdata/sf1 target/sfdata/sf10 10 all
[ -f target/sfdata/sf20/documents.parquet/_SUCCESS ] || \
  SPARK_DRIVER_MEM=40g run $J graft.ScaleGen target/sfdata/sf10 target/sfdata/sf20 2 \
    documents,embeddings
[ -f target/sfdata/sf40/embeddings.parquet/_SUCCESS ] || \
  SPARK_DRIVER_MEM=48g run $J graft.ScaleGen target/sfdata/sf20 target/sfdata/sf40 2 \
    documents,embeddings
[ -f target/sfdata/sf80/embeddings.parquet/_SUCCESS ] || \
  SPARK_DRIVER_MEM=48g run $J graft.ScaleGen target/sfdata/sf40 target/sfdata/sf80 2 \
    documents,embeddings
[ -f target/sfdata/sf160/embeddings.parquet/_SUCCESS ] || \
  SPARK_DRIVER_MEM=64g run $J graft.ScaleGen target/sfdata/sf80 target/sfdata/sf160 2 \
    documents,embeddings

# ---- phase 1: bottom of the ladder — touched subset, sf1 -> sf10
# transition (q30's lineitem exists at these rungs via 'all')
runj shuffle_audit_sf1_opt.json $J graft.ShuffleAudit target/sfdata/sf1 $TOUCHED_WIDE
SPARK_DRIVER_MEM=40g runj shuffle_audit_sf10_opt.json $J graft.ShuffleAudit target/sfdata/sf10 $TOUCHED_WIDE
run $J graft.ScaleCheck audits shuffle_audit_sf1_opt.json shuffle_audit_sf10_opt.json 10 SCALE_r15c.json transition
ckpt "Round-15c ladder sf1-sf10 on the optimization tree (touched subset + mining family)"

# ---- phase 2: sf20 postcap (q30 drops out: sf20 has no lineitem —
# its historical coverage also stopped at the core ladder)
SPARK_DRIVER_MEM=40g runj shuffle_audit_sf20_opt.json $J graft.ShuffleAudit target/sfdata/sf20 $TOUCHED_20
subset shuffle_audit_sf10_opt.json "$T20_CSV" shuffle_audit_sf10_opt9.json
run $J graft.ScaleCheck audits shuffle_audit_sf10_opt9.json shuffle_audit_sf20_opt.json 2 SCALE_r15c_postcap.json postcap
ckpt "Round-15c sf20 postcap on the optimization tree"

# ---- phase 3: mining rungs sf40 -> sf160 (the d13 CC fix's proof:
# the unpinned r15b rung spilled 25.8 GB at sf160)
SPARK_DRIVER_MEM=48g runj shuffle_audit_sf40.json $J graft.ShuffleAudit target/sfdata/sf40 $M
subset shuffle_audit_sf20_opt.json "$M_CSV" shuffle_audit_sf20_mining.json
run $J graft.ScaleCheck audits shuffle_audit_sf20_mining.json shuffle_audit_sf40.json 2 SCALE_r15c_sf40.json postcap
SPARK_DRIVER_MEM=48g runj shuffle_audit_sf80.json $J graft.ShuffleAudit target/sfdata/sf80 $M
run $J graft.ScaleCheck audits shuffle_audit_sf40.json shuffle_audit_sf80.json 2 SCALE_r15c_sf80.json answers
SPARK_DRIVER_MEM=80g runj shuffle_audit_sf160.json $J graft.ShuffleAudit target/sfdata/sf160 $M
run $J graft.ScaleCheck audits shuffle_audit_sf80.json shuffle_audit_sf160.json 2 SCALE_r15c_sf160.json answers
ckpt "Round-15c mining rungs sf40-sf160: the CC symmetrize+pin at the scale that spilled"

echo "[r15c] done; failures: ${#FAIL[@]}"
for f in "${FAIL[@]:-}"; do [ -n "$f" ] && echo "[r15c] FAILED: $f"; done
