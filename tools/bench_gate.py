#!/usr/bin/env python3
"""Round-over-round tripwire for the sf1 serial bench (VERDICT r13 #5).

The driver's sf0.1 artifact is produced under co-running load and has
now logged three rounds of phantom creep, while a real +33% at sf1
sailed through unflagged — the sf1 serial artifact is the only
trustworthy wall-clock series, so IT gets the gate. From r15 on the
preferred inputs are elementwise-min artifacts (tools/bench_min.py
over >=2 serial runs, VERDICT r14 #4): the box swings 1.5x hourly, so
a single run can neither demonstrate the bar nor catch a <1.5x code
regression — min-across-runs is the code's time, not the host's.

Usage: bench_gate.py <baseline sf1 json> <fresh sf1 json>
       [--ratio=1.3] [--topn=10] [--round=N] [--out=BENCHGATE_rN.json]

Options are --k=v form only. --round (or the rN in --out) tells the
gate which round is firing, so allowlist entries can EXPIRE.

Fails (exit 1) when the fresh med-sum exceeds ratio x the baseline's,
or when any of the top-N queries (by fresh min time) regressed more
than ratio x on min time vs the same query in the baseline. A failure
means: attribute the move in PLANS.md or fix it — never ship the
artifact unexplained.

Both files are graft.Bench single-line JSON: {"value": medSumSec,
"queries": {name: {"min": s, "med": s, ...}}}. Queries missing from
either side (added or removed this round) are skipped everywhere,
including the med-sum — no history, no tripwire.
"""
import json
import re
import sys

# Attributed exceptions, same discipline as ScaleCheck's allowlist,
# PLUS an expiry (VERDICT r14 #2: a permanent name-keyed allowlist
# converges to a hole): each entry is stamped with the round whose
# evidence justified it, and an entry that FIRES >= EXPIRY rounds past
# its stamp fails the gate anyway — the attribution must be re-earned
# with fresh measurements (re-stamp it here, citing the new PLANS.md
# entry). A flagged move on a live entry is RECORDED in the artifact
# (never silent) but does not fail the gate.
EXPIRY = 2
ALLOW = {
    'm05_audio_decode': {'round': 14, 'why':
        'machine-state: audio family moves ~1.4x with host state; '
        'reproduced idle, same-day sf0.1 runs read 0.38 AND 0.52 s. '
        'NOTE r14 also changed m05\'s sf1 plan deliberately (corpus-'
        'gated fan-out, FanOutMinDocs=15000, MultimodalQueries) — the '
        'gate reinstates the decode exchange at sf1+, expected '
        'neutral-to-faster there (PLANS.md round-14 tripwire '
        'attribution)'},
    'm08_audio_fingerprint': {'round': 14, 'why':
        'machine-state: see m05 (PLANS.md round-14)'},
    'm09_scene_change': {'round': 14, 'why':
        'machine-state: see m05 (PLANS.md round-14)'},
    'm10_audio_segments': {'round': 14, 'why':
        'machine-state: see m05 (PLANS.md round-14)'},
    'm02_frame_sample': {'round': 14, 'why':
        'machine-state: codec family; intra-day control measured '
        '2.37 -> 3.31 s on identical code (PLANS.md round-14)'},
}


def load(path):
    with open(path) as f:
        return json.loads(f.readline())


def main(argv):
    args = [a for a in argv if not a.startswith('--')]
    opts = {}
    for a in argv:
        if a.startswith('--'):
            if '=' not in a:
                sys.exit("options are --k=v form (e.g. --ratio=1.3):\n\n"
                         + __doc__)
            k, v = a.lstrip('-').split('=', 1)
            opts[k] = v
    if len(args) != 2:
        sys.exit(__doc__)
    ratio = float(opts.get('ratio', 1.3))
    topn = int(opts.get('topn', 10))
    rnd = None
    if 'round' in opts:
        rnd = int(opts['round'])
    elif 'out' in opts:
        m = re.search(r'_r(\d+)', opts['out'])
        if m:
            rnd = int(m.group(1))
    base, fresh = load(args[0]), load(args[1])
    fails, attributed = [], []

    def allow_why(n):
        """Live why-string, or None when the entry is absent/expired."""
        e = ALLOW.get(n)
        if e is None:
            return None
        if rnd is not None and rnd - e['round'] >= EXPIRY:
            return None
        return e['why']

    bq, fq = base.get('queries', {}), fresh.get('queries', {})
    slowest = sorted(fq, key=lambda n: -fq[n].get('min', 0.0))[:topn]
    for n in slowest:
        if n not in bq:
            continue
        bmin, fmin = bq[n].get('min', 0.0), fq[n].get('min', 0.0)
        if bmin > 0 and fmin > bmin * ratio:
            line = (f'{n} min {bmin:.2f} -> {fmin:.2f} s '
                    f'({fmin / bmin:.2f}x > {ratio}x)')
            why = allow_why(n)
            if why is not None:
                attributed.append(line + ' — ' + why)
            elif n in ALLOW:
                fails.append(line + ' — allowlist entry STAMPED r%d '
                             'EXPIRED in r%s: re-earn the attribution '
                             'with fresh measurements or fix'
                             % (ALLOW[n]['round'], rnd))
            else:
                fails.append(line)

    # the med-sum tripwire runs over the INTERSECTION of query names
    # (a query added this round has no baseline counterpart; a removed
    # one would deflate the fresh sum — both distort a sum over
    # non-matching sets) and excludes the allowlisted queries' deltas
    # on BOTH sides, so an attributed family can't mask (or cause) a
    # whole-suite move. Expired entries still count as allowlisted
    # here: their per-query tripwire above is the enforcement point,
    # and folding a known-swinging family back into the sum would
    # punish unrelated queries for it.
    common = set(bq) & set(fq)

    def medsum(q):
        return sum(e.get('med', 0.0) for n, e in q.items()
                   if n in common and n not in ALLOW)
    bsum, fsum = medsum(bq), medsum(fq)
    if bsum and fsum > bsum * ratio:
        fails.append(f'med-sum (common queries, excl. allowlisted) '
                     f'{bsum:.1f} -> {fsum:.1f} s '
                     f'({fsum / bsum:.2f}x > {ratio}x)')

    if 'out' in opts:
        doc = {
            'note': 'round-over-round tripwire on the serial sf1 bench '
                    '(VERDICT r13 #5): med-sum (common queries) and '
                    'top-%d per-query min times vs the previous round\'s '
                    'committed sf1 artifact within %gx, else attribute '
                    'in PLANS.md. Allowlisted moves are recorded under '
                    '"attributed" (never silent), excluded from the '
                    'med-sum on both sides, and EXPIRE %d rounds after '
                    'their stamp (VERDICT r14 #2).'
                    % (topn, ratio, EXPIRY),
            'baseline': args[0], 'fresh': args[1], 'round': rnd,
            'baseline_med_sum_s': round(bsum, 3),
            'fresh_med_sum_s': round(fsum, 3),
            'violations': fails, 'attributed': attributed,
            'all_ok': not fails,
        }
        with open(opts['out'], 'w') as f:
            json.dump(doc, f, indent=1)

    for a in attributed:
        print('[bench_gate] attributed: ' + a)
    if fails:
        print('[bench_gate] REGRESSION vs %s — attribute in PLANS.md '
              'or fix:' % args[0])
        for f in fails:
            print('[bench_gate]   ' + f)
        return 1
    print(f'[bench_gate] ok: med-sum {fsum:.1f} s vs {bsum:.1f} s baseline '
          f'(common queries, excl. allowlisted); top-{topn} query mins '
          f'within {ratio}x')
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1:]))
