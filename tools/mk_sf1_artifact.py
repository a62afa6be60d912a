#!/usr/bin/env python3
"""Assemble BENCH_sf1_r06.json from the two clean bench runs."""
import json

s01 = json.load(open('/tmp/bench_sf01_r6.json'))
s1 = json.load(open('/tmp/bench_sf1_r6.json'))
q01, q1 = s01['queries'], s1['queries']
ratios = {}
for k, v1 in sorted(q1.items()):
    v0 = q01.get(k)
    if k == '_other' or v0 is None or v0 < 0.3:
        continue
    ratios[k] = round(v1 / v0, 1)
art = {
    'note': ('round-6 scaling run, post JIT-code-cache fix (1g '
             'ReservedCodeCacheSize: the earlier 240m default let a '
             'full-suite session disable the JIT mid-run, '
             'nondeterministically inflating late queries up to 50x; '
             'with it sized correctly the suite is stable): synthetic '
             'sf1 = 10x replica of sf0.1, local[32], min of 2 timed '
             'passes after warmup. Ratios reported only for queries '
             '>= 0.3s at sf0.1 (below that, per-query JVM noise '
             'dominates).'),
    'sf0.1_total_sec': s01['value'],
    'sf1_total_sec': s1['value'],
    'wall_ratio_at_10x_rows': round(s1['value'] / s01['value'], 1),
    'per_query_ratio': ratios,
    'sf1_queries': dict(sorted(q1.items(), key=lambda x: x[1])),
}
json.dump(art, open('/root/repo/BENCH_sf1_r06.json', 'w'), indent=1)
worst = sorted(ratios.items(), key=lambda x: -x[1])[:10]
print('wall ratio', art['wall_ratio_at_10x_rows'])
print('worst scalers:', worst)
