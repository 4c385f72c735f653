#!/usr/bin/env python3
"""Round-over-round tripwire for the sf1 serial bench (VERDICT r13 #5).

The driver's sf0.1 artifact is produced under co-running load and has
now logged three rounds of phantom creep, while a real +33% at sf1
sailed through unflagged — the sf1 serial artifact is the only
trustworthy wall-clock series, so IT gets the gate.

Usage: bench_gate.py <baseline BENCH_sf1.json> <fresh BENCH_sf1.json>
       [--ratio 1.3] [--topn 10] [--out BENCHGATE_rN.json]

Fails (exit 1) when the fresh med-sum exceeds ratio x the baseline's,
or when any of the top-N queries (by fresh min time) regressed more
than ratio x on min time vs the same query in the baseline. A failure
means: attribute the move in PLANS.md or fix it — never ship the
artifact unexplained.

Both files are graft.Bench single-line JSON: {"value": medSumSec,
"queries": {name: {"min": s, "med": s, ...}}}. Queries missing from
the baseline (new this round) are skipped — no history, no tripwire.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.readline())


def main(argv):
    args = [a for a in argv if not a.startswith('--')]
    opts = {k: v for k, v in (a.lstrip('-').split('=', 1)
            for a in argv if a.startswith('--'))}
    if len(args) != 2:
        sys.exit(__doc__)
    ratio = float(opts.get('ratio', 1.3))
    topn = int(opts.get('topn', 10))
    base, fresh = load(args[0]), load(args[1])
    fails = []

    bsum, fsum = base.get('value'), fresh.get('value')
    if bsum and fsum and fsum > bsum * ratio:
        fails.append(f'med-sum {bsum:.1f} -> {fsum:.1f} s '
                     f'({fsum / bsum:.2f}x > {ratio}x)')

    bq, fq = base.get('queries', {}), fresh.get('queries', {})
    slowest = sorted(fq, key=lambda n: -fq[n].get('min', 0.0))[:topn]
    for n in slowest:
        if n not in bq:
            continue
        bmin, fmin = bq[n].get('min', 0.0), fq[n].get('min', 0.0)
        if bmin > 0 and fmin > bmin * ratio:
            fails.append(f'{n} min {bmin:.2f} -> {fmin:.2f} s '
                         f'({fmin / bmin:.2f}x > {ratio}x)')

    if 'out' in opts:
        doc = {
            'note': 'round-over-round tripwire on the serial sf1 bench '
                    '(VERDICT r13 #5): med-sum and top-%d per-query min '
                    'times vs the previous round\'s committed BENCH_sf1 '
                    'within %gx, else attribute in PLANS.md' % (topn, ratio),
            'baseline': args[0], 'fresh': args[1],
            'baseline_med_sum_s': bsum, 'fresh_med_sum_s': fsum,
            'violations': fails, 'all_ok': not fails,
        }
        with open(opts['out'], 'w') as f:
            json.dump(doc, f, indent=1)

    if fails:
        print('[bench_gate] REGRESSION vs %s — attribute in PLANS.md '
              'or fix:' % args[0])
        for f in fails:
            print('[bench_gate]   ' + f)
        return 1
    print(f'[bench_gate] ok: med-sum {fsum:.1f} s vs {bsum:.1f} s baseline; '
          f'top-{topn} query mins within {ratio}x')
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1:]))
