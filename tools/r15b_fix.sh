#!/bin/bash
# Round-15b: re-prove the sf160 red gate (SCALE_r15_sf160.json — the
# rung's first firing caught the pair-dedup aggregate cliff) GREEN on
# the fixed tree. The fix (Similarity.EmbPairBudget + the d03-shape
# pair repartition in nearDupPairs/multiProbePairs) changes exactly
# three query plans (s03/s11/d13) and only at sf20+, so the re-proof
# is a self-contained same-tree MINING-FAMILY ladder: subset audits
# sf1→sf160 with transition/postcap/answers gates. The r15a
# full-surface core-ladder artifacts keep their pre-fix stamp —
# documented in PLANS.md round-15b. Also re-runs SkewDrill (the
# sweep's instance died when its spark temp dirs were removed by an
# external /tmp cleanup mid-run). STRICTLY SERIAL.
set -u
cd "$(dirname "$0")/.."
J=tools/jrun.sh
FAIL=()
run() { echo "[r15b] $(date +%H:%M:%S) $*" >&2; "$@" || FAIL+=("$1 $2"); }
runj() { local out=$1; shift
  echo "[r15b] $(date +%H:%M:%S) $* > $out" >&2
  if "$@" > "$out.tmp"; then mv "$out.tmp" "$out"; else
    rm -f "$out.tmp"; FAIL+=("$out"); return 1; fi; }
ckpt() { python3 tools/gate_table.py >/dev/null 2>&1
  git add -A && git commit -q -m "$1" && echo "[r15b] committed: $1" >&2; }

M="d03_ngram_jaccard d04_minhash_lsh d13_semantic_clusters \
s03_embed_neardup s11_multiprobe_neardup"

# ---- the bottom of the ladder: fresh subset audits (the full-surface
# sf1/sf10/sf20 audits are r15a's; these live under *_mining names so
# the full-surface artifacts stay intact)
runj shuffle_audit_sf1_mining.json $J graft.ShuffleAudit target/sfdata/sf1 $M
SPARK_DRIVER_MEM=40g runj shuffle_audit_sf10_mining.json $J graft.ShuffleAudit target/sfdata/sf10 $M
SPARK_DRIVER_MEM=40g runj shuffle_audit_sf20_mining.json $J graft.ShuffleAudit target/sfdata/sf20 $M
run $J graft.ScaleCheck audits shuffle_audit_sf1_mining.json shuffle_audit_sf10_mining.json 10 SCALE_r15b.json transition
run $J graft.ScaleCheck audits shuffle_audit_sf10_mining.json shuffle_audit_sf20_mining.json 2 SCALE_r15b_postcap.json postcap
ckpt "Round-15b mining ladder sf1-sf20 on the pair-dedup pin"

# ---- the scales that measured the defect
SPARK_DRIVER_MEM=48g runj shuffle_audit_sf40.json $J graft.ShuffleAudit target/sfdata/sf40 $M
run $J graft.ScaleCheck audits shuffle_audit_sf20_mining.json shuffle_audit_sf40.json 2 SCALE_r15b_sf40.json postcap
SPARK_DRIVER_MEM=48g runj shuffle_audit_sf80.json $J graft.ShuffleAudit target/sfdata/sf80 $M
run $J graft.ScaleCheck audits shuffle_audit_sf40.json shuffle_audit_sf80.json 2 SCALE_r15b_sf80.json answers
SPARK_DRIVER_MEM=80g runj shuffle_audit_sf160.json $J graft.ShuffleAudit target/sfdata/sf160 $M
run $J graft.ScaleCheck audits shuffle_audit_sf80.json shuffle_audit_sf160.json 2 SCALE_r15b_sf160.json answers
ckpt "Round-15b mining rungs sf40-sf160: the sf160 red gate re-proven green on the fixed tree"

# ---- SkewDrill re-run (fresh provenance)
run $J graft.SkewDrill target/sfdata/sf10 target/sfdata/sf10skew SKEW_r15.json
ckpt "Round-15 SkewDrill (re-run: the sweep's instance lost its spark temp dirs to an external /tmp cleanup)"

echo "[r15b] done; failures: ${#FAIL[@]}"
for f in "${FAIL[@]:-}"; do [ -n "$f" ] && echo "[r15b] FAILED: $f"; done
