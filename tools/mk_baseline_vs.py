#!/usr/bin/env python3
"""Join graft.BaselineVs output with BASELINE_MEASURED.json into
BASELINE_VS.json: per-op graft/pypond wall ratios at the same scale
factor, on the same parquet input.

Comparison contract (stated in BASELINE_MEASURED.json's note): a graft
query time includes the parquet scan + groupBy, so each op's pypond
side is op + ts_construct (the split-and-construct pypond needs before
any op can run).

Usage: python3 tools/mk_baseline_vs.py <graft_ops.json> \
         <BASELINE_MEASURED.json> <BASELINE_VS.json>
"""
import json
import sys


def main():
    graft = json.load(open(sys.argv[1]))
    base = json.load(open(sys.argv[2]))
    py = base['python_sec']
    construct = py['ts_construct']
    ops = {}
    skipped = []
    for name, gsec in sorted(graft['graft_sec'].items()):
        if name not in py:
            continue
        psec = py[name] + construct
        if psec <= 0:
            # a zero/negative pypond time is a measurement error, not a
            # ratio — flag it instead of dividing by it
            skipped.append(name)
            continue
        ops[name] = {
            'graft_sec': round(gsec, 3),
            'pypond_sec': round(psec, 3),
            'pypond_op_sec': py[name],
            'ratio': round(gsec / psec, 3),
        }
    if not ops:
        sys.exit('mk_baseline_vs: no graft op names overlap '
                 f'{sys.argv[2]} python_sec keys — was an op renamed? '
                 f'graft keys: {sorted(graft["graft_sec"])[:10]}...')
    if skipped:
        print(f'mk_baseline_vs: skipped {skipped} (pypond_sec <= 0)',
              file=sys.stderr)
    worst = max(ops.values(), key=lambda o: o['ratio'])['ratio']
    artifact = {
        'note': ('per-op graft/pypond wall ratio at the same sf on the '
                 'same parquet (ratio < 1 means graft is faster). '
                 'pypond_sec = op + ts_construct (pypond must split '
                 'rows into grouped TimeSeries before any op; graft '
                 'query times include the equivalent scan + groupBy). '
                 'graft timed min-of-5 after 2 warmups '
                 '(graft.BaselineVs), pypond min-of-2 '
                 '(tools/baseline_pypond.py).'),
        'sf': graft['sf'],
        'rows': base['rows'],
        'worst_ratio': worst,
        'ops': ops,
    }
    with open(sys.argv[3], 'w') as fh:
        json.dump(artifact, fh, indent=1)
    print(f'wrote {sys.argv[3]}: {len(ops)} ops, worst ratio {worst}')


if __name__ == '__main__':
    main()
