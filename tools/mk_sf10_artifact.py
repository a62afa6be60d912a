#!/usr/bin/env python3
"""Assemble the sf10 scale artifact from two graft.BenchScale runs
(sf0.1 + synthetic sf10 = 100x rows): per-leg seconds and wall-time
exponents (log ratio / log 100; 1.0 = linear scaling).

Usage: mk_sf10_artifact.py <sf01.json> <sf10.json> <out.json> <note>
"""
import json, math, sys


def main():
    s01 = json.loads(open(sys.argv[1]).read().strip())
    s10 = json.loads(open(sys.argv[2]).read().strip())
    q01, q10 = s01['queries'], s10['queries']
    legs = {}
    for k in q10:
        v0, v1 = q01.get(k), q10[k]
        if v0 is None or v0 <= 0 or v1 <= 0:
            continue
        legs[k] = {
            'sf0.1_sec': v0,
            'sf10_sec': v1,
            'exponent': round(math.log(v1 / v0) / math.log(100.0), 2),
        }
    art = {
        'note': sys.argv[4],
        'sf0.1_total_sec': s01['value'],
        'sf10_total_sec': s10['value'],
        # fixed synthetic calibration leg (r14): identical work in every
        # run — divergent canaries mean the absolute totals are not
        # box-comparable and only the per-leg exponents should be read
        'canary_sec_sf0.1': s01.get('canary_sec'),
        'canary_sec_sf10': s10.get('canary_sec'),
        'n_emb_sf10': s10.get('n_emb'),
        'lsh_planes_sf10': s10.get('lsh_planes'),
        'legs': dict(sorted(legs.items(),
                            key=lambda x: -x[1]['exponent'])),
    }
    json.dump(art, open(sys.argv[3], 'w'), indent=1)
    for k, v in art['legs'].items():
        print(f"{k}: {v['sf0.1_sec']}s -> {v['sf10_sec']}s  exp {v['exponent']}")


if __name__ == '__main__':
    main()
