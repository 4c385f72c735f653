#!/bin/bash
# sf80 -> sf160 answers rung: one more doubling for the mining family
# PLUS the three queries whose sf80 spill cliff round 13b fixed
# (a14/x08 directly; g03 was aborted by the disk-fill). Requires
# target/sfdata/sf160 with documents/embeddings/events (ScaleGen K=2
# from sf80) and the r13b sf80 audits on the same HEAD.
# The A side merges the sweep's sf80 mining audit with the sf80 heavy
# audit (both carry the same _meta stamp; q21 needs lineitem, which
# sf160 deliberately omits — dropped from the rung).
set -eu
cd "$(dirname "$0")/.."
J=tools/jrun.sh
Q="d03_ngram_jaccard d04_minhash_lsh d13_semantic_clusters \
s03_embed_neardup s11_multiprobe_neardup a14_gap_fill \
x08_source_overlap g03_bfs_reach"
SPARK_DRIVER_MEM=80g $J graft.ShuffleAudit target/sfdata/sf160 $Q \
  > shuffle_audit_sf160.json
python3 - <<'PY'
import json
mining = json.load(open('shuffle_audit_sf80.json'))
heavy = json.load(open('shuffle_audit_sf80_heavy.json'))
assert mining['_meta']['src_tree'] == heavy['_meta']['src_tree'], \
    'sf80 audits were produced on different code'
names = [k for k in json.load(open('shuffle_audit_sf160.json')) if not k.startswith('_')]
merged = {'_meta': mining['_meta']}
for n in names:
    merged[n] = mining.get(n) or heavy[n]
open('shuffle_audit_sf80_merged.json', 'w').write(json.dumps(merged))
PY
$J graft.ScaleCheck audits shuffle_audit_sf80_merged.json shuffle_audit_sf160.json 2 \
  "SCALE_r13_sf160.json" answers
