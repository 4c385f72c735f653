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

# Attributed exceptions, same discipline as ScaleCheck's allowlist:
# a flagged move on one of these queries is RECORDED in the artifact
# (never silent) but does not fail the gate; the why-string must point
# at a PLANS.md attribution with the measurements behind it.
ALLOW = {
    'm05_audio_decode': 'machine-state: audio family moves ~1.4x with host state; '
        'flat r11->r13, no multimodal code change, reproduced idle, same-day '
        'sf0.1 runs read 0.38 AND 0.52 s (PLANS.md round-14 tripwire attribution)',
    'm08_audio_fingerprint': 'machine-state: see m05 (PLANS.md round-14)',
    'm09_scene_change': 'machine-state: see m05 (PLANS.md round-14)',
    'm10_audio_segments': 'machine-state: see m05 (PLANS.md round-14)',
    'm02_frame_sample': 'machine-state: codec family; intra-day control '
        'measured 2.37 -> 3.31 s on identical code (PLANS.md round-14)',
}


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
    fails, attributed = [], []

    bq, fq = base.get('queries', {}), fresh.get('queries', {})
    slowest = sorted(fq, key=lambda n: -fq[n].get('min', 0.0))[:topn]
    for n in slowest:
        if n not in bq:
            continue
        bmin, fmin = bq[n].get('min', 0.0), fq[n].get('min', 0.0)
        if bmin > 0 and fmin > bmin * ratio:
            line = (f'{n} min {bmin:.2f} -> {fmin:.2f} s '
                    f'({fmin / bmin:.2f}x > {ratio}x)')
            if n in ALLOW:
                attributed.append(line + ' — ' + ALLOW[n])
            else:
                fails.append(line)

    # the med-sum tripwire excludes the allowlisted queries' deltas on
    # BOTH sides, so an attributed family can't mask (or cause) a
    # whole-suite move
    def medsum(q, names):
        return sum(e.get('med', 0.0) for n, e in q.items() if n not in names)
    bsum, fsum = medsum(bq, ALLOW), medsum(fq, ALLOW)
    if bsum and fsum > bsum * ratio:
        fails.append(f'med-sum (excl. allowlisted) {bsum:.1f} -> {fsum:.1f} s '
                     f'({fsum / bsum:.2f}x > {ratio}x)')

    if 'out' in opts:
        doc = {
            'note': 'round-over-round tripwire on the serial sf1 bench '
                    '(VERDICT r13 #5): med-sum and top-%d per-query min '
                    'times vs the previous round\'s committed BENCH_sf1 '
                    'within %gx, else attribute in PLANS.md. Allowlisted '
                    'moves are recorded under "attributed" (never silent) '
                    'and excluded from the med-sum on both sides.'
                    % (topn, ratio),
            'baseline': args[0], 'fresh': args[1],
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
          f'(excl. allowlisted); top-{topn} query mins within {ratio}x')
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1:]))
