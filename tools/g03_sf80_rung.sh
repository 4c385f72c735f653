#!/bin/bash
# g03_bfs_reach sf40 -> sf80 rung: the one heavy query whose sf80
# datapoint the r13a disk-fill aborted and the r13b re-measure did not
# cover (ADVICE r13). Requires target/sfdata/sf80 with the full table
# set and shuffle_audit_sf40_heavy.json (which carries g03) on the
# same src_tree.
set -eu
cd "$(dirname "$0")/.."
J=tools/jrun.sh
SPARK_DRIVER_MEM=64g $J graft.ShuffleAudit target/sfdata/sf80 g03_bfs_reach \
  > shuffle_audit_sf80_g03.json.tmp && \
  mv shuffle_audit_sf80_g03.json.tmp shuffle_audit_sf80_g03.json
python3 - <<'PY'
import json, sys
full = json.load(open('shuffle_audit_sf40_heavy.json'))
if 'g03_bfs_reach' not in full:
    sys.exit('g03_bfs_reach missing from shuffle_audit_sf40_heavy.json')
sub = {'_meta': full['_meta'], 'g03_bfs_reach': full['g03_bfs_reach']}
open('shuffle_audit_sf40_g03.json', 'w').write(json.dumps(sub))
PY
$J graft.ScaleCheck audits shuffle_audit_sf40_g03.json shuffle_audit_sf80_g03.json 2 \
  "SCALE_r${RUNG_ROUND:-15}_sf80_g03.json" answers
