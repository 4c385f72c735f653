#!/bin/bash
# sf80 -> sf160 answers rung: one more doubling for the mining family
# PLUS the two queries whose sf80 spill cliff round 13b fixed on
# derived sizing (a14/x08) — the rung tests that sizing at a scale it
# was NOT tuned on. Requires target/sfdata/sf160 with
# documents/embeddings/events (ScaleGen K=2 from sf80) and the sf80
# audits on the same src_tree.
#
# g03_bfs_reach is deliberately NOT here: it reads lineitem/orders/
# customer, which sf160 omits (disk budget). Its missing sf80
# datapoint (aborted by the r13a disk-fill) is covered by
# tools/g03_sf80_rung.sh instead.
#
# The A side merges the sweep's sf80 mining audit with the sf80 heavy
# audit; each rung query must appear in EXACTLY one of them, checked
# explicitly (ADVICE r13: `mining.get(n) or heavy[n]` KeyError'd on
# absent queries and silently preferred heavy for falsy entries).
set -eu
cd "$(dirname "$0")/.."
J=tools/jrun.sh
Q="d03_ngram_jaccard d04_minhash_lsh d13_semantic_clusters \
s03_embed_neardup s11_multiprobe_neardup a14_gap_fill \
x08_source_overlap"
SPARK_DRIVER_MEM=80g $J graft.ShuffleAudit target/sfdata/sf160 $Q \
  > shuffle_audit_sf160.json.tmp && \
  mv shuffle_audit_sf160.json.tmp shuffle_audit_sf160.json
python3 - <<'PY'
import json, sys
mining = json.load(open('shuffle_audit_sf80.json'))
heavy = json.load(open('shuffle_audit_sf80_heavy.json'))
assert mining['_meta']['src_tree'] == heavy['_meta']['src_tree'], \
    'sf80 audits were produced on different code'
names = [k for k in json.load(open('shuffle_audit_sf160.json')) if not k.startswith('_')]
merged = {'_meta': mining['_meta']}
for n in names:
    in_m, in_h = n in mining, n in heavy
    if in_m and in_h:
        sys.exit(f'{n} present in BOTH sf80 audits - ambiguous A side')
    if not (in_m or in_h):
        sys.exit(f'{n} missing from both sf80 audits - no A-side rung point')
    merged[n] = mining[n] if in_m else heavy[n]
open('shuffle_audit_sf80_merged.json', 'w').write(json.dumps(merged))
print(f'merged A side: {len(names)} queries')
PY
$J graft.ScaleCheck audits shuffle_audit_sf80_merged.json shuffle_audit_sf160.json 2 \
  "SCALE_r${RUNG_ROUND:-15}_sf160.json" answers
