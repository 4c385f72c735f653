#!/usr/bin/env python3
"""Elementwise-min merge of graft.Bench sf1 artifacts (VERDICT r14 #4).

The box swings 1.5x hourly (proven by the r14 intra-day control: two
full sf1 runs 80 min apart on identical code moved the audio family
1.4-1.6x while the same day's sf0.1 run was the fastest of the day),
so ONE sf1 artifact can neither demonstrate the wall-clock bar nor
catch a <1.5x code regression. The per-query min across >=2 serial
runs is the code's time, not the host's — commit THAT as
BENCH_sf1_min.json and point tools/bench_gate.py at it.

Usage: bench_min.py <out.json> <run1.json> <run2.json> [...]

Inputs are graft.Bench single-line JSON: {"metric":..., "value": N,
"unit": "sec", "queries": {name: {"min": s, "med": s, ...}}, ...}.
The output keeps the first run's non-query fields, takes the
elementwise min of every numeric per-query stat across the runs (a
query must appear in EVERY run to be merged — a partial run must not
masquerade as a fast one), recomputes "value" as the sum of merged
"med"s, and records the input filenames under "_merged_from".
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.readline())


def main(argv):
    if len(argv) < 3:
        sys.exit(__doc__)
    out, paths = argv[0], argv[1:]
    runs = [load(p) for p in paths]
    qsets = [set(r.get('queries', {})) for r in runs]
    common = set.intersection(*qsets)
    dropped = sorted(set.union(*qsets) - common)
    if dropped:
        sys.stderr.write('[bench_min] WARNING: %d queries missing from '
                         'some run, dropped from the merge: %s\n'
                         % (len(dropped), ', '.join(dropped)))
    merged = dict(runs[0])
    mq = {}
    for n in sorted(common):
        entries = [r['queries'][n] for r in runs]
        keys = set.intersection(*[set(e) for e in entries])
        mq[n] = {k: (min(e[k] for e in entries)
                     if all(isinstance(e[k], (int, float)) for e in entries)
                     else entries[0][k])
                 for k in keys}
    merged['queries'] = mq
    merged['value'] = round(sum(e.get('med', 0.0) for e in mq.values()), 3)
    merged['_merged_from'] = paths
    merged['_merge'] = 'elementwise min across %d serial runs' % len(runs)
    with open(out, 'w') as f:
        f.write(json.dumps(merged) + '\n')
    print('[bench_min] %s <- min over %d runs, %d queries, '
          'med-sum %.1f s' % (out, len(runs), len(mq), merged['value']))
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1:]))
