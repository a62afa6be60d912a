#!/usr/bin/env python3
"""Assemble a BENCH_sf1_r{N}.json scale artifact from two full-suite
graft.Bench runs (sf0.1 + synthetic sf1 = 10x rows).

Usage: mk_sf1_artifact.py <sf01.json> <sf1.json> <out.json> <note>
"""
import json
import sys


def main():
    s01 = json.loads(open(sys.argv[1]).read().strip())
    s1 = json.loads(open(sys.argv[2]).read().strip())
    q01, q1 = s01['queries'], s1['queries']
    ratios = {}
    for k, v1 in sorted(q1.items()):
        v0 = q01.get(k)
        if k == '_other' or v0 is None or v0 < 0.3:
            # below 0.3s at sf0.1, per-query JVM noise dominates
            continue
        ratios[k] = round(v1 / v0, 1)
    art = {
        'note': sys.argv[4],
        'sf0.1_total_sec': s01['value'],
        'sf1_total_sec': s1['value'],
        # fixed synthetic calibration leg (r14): identical work in every
        # run — divergent canaries mean the absolute totals are not
        # box-comparable and only the ratios should be read
        'canary_sec_sf0.1': s01.get('canary_sec'),
        'canary_sec_sf1': s1.get('canary_sec'),
        'wall_ratio_at_10x_rows': round(s1['value'] / s01['value'], 2),
        'per_query_ratio': ratios,
        'sf1_queries': dict(sorted(q1.items(), key=lambda x: x[1])),
    }
    json.dump(art, open(sys.argv[3], 'w'), indent=1)
    worst = sorted(ratios.items(), key=lambda x: -x[1])[:10]
    print('wall ratio', art['wall_ratio_at_10x_rows'])
    print('worst scalers:', worst)


if __name__ == '__main__':
    main()
