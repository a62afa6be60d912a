#!/usr/bin/env python3
"""Measure the reference library's single-node throughput on the same
parquet inputs graft benches against, producing BASELINE_MEASURED.json.

pypond (the reference) is a row-at-a-time in-memory Python library: it
has no parquet reader and no benchmark suite of its own, so this
harness feeds it the events table as (ms, value) points and times the
library's own public operations. Each op mirrors a named graft query —
same grouping, same window, same subset — so BENCH_r*.json numbers
compare one-to-one at the same scale factor:

  ts_agg_basic    per-event_type sum/avg/min/max/count
  ts_agg_stats    per-event_type median/stdev/percentile(90)
  ts_rollup_5m    per-user fixed_window_rollup('5m', avg+sum+max+count)
  ts_align_linear clicks only, per-user align('value', '1d', 'linear')
  ts_rate         purchases only, per-user rate('value')
  ts_fill_linear  per-user fill('value', 'linear') with value<5 masked
                  to None (SparkEntry.masked)

The missing third-party deps (pyrsistent, humanize, tzlocal) are
shimmed in tools/refbaseline/ — functional copies of the tiny API
surface pypond touches; timings are representative of the real
dependencies.

Usage: python3 tools/baseline_pypond.py [sf_dir] [out_json]
"""
import json
import sys
import time

sys.path.insert(0, '/root/repo/tools/refbaseline')
sys.path.insert(0, '/root/reference')

import pyarrow.parquet as pq  # noqa: E402
from pypond.series import TimeSeries  # noqa: E402
from pypond.functions import Functions  # noqa: E402
from pypond.range import TimeRange  # noqa: E402


def load(sf_dir):
    tbl = pq.read_table(f'{sf_dir}/events.parquet',
                        columns=['ts', 'event_type', 'user_id', 'value'])
    ts_ms = [t // 10**6 for t in tbl.column('ts').cast('int64').to_pylist()]
    return list(zip(ts_ms, tbl.column('event_type').to_pylist(),
                    tbl.column('user_id').to_pylist(),
                    tbl.column('value').to_pylist()))


def series_by(rows, key_fn, val_fn=lambda r: r[3], pred=lambda r: True,
              col='value'):
    groups = {}
    for r in rows:
        if pred(r):
            groups.setdefault(key_fn(r), []).append([r[0], val_fn(r)])
    out = {}
    for k, pts in groups.items():
        pts.sort(key=lambda p: p[0])
        out[k] = TimeSeries(
            {'name': str(k), 'columns': ['time', col], 'points': pts})
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    out = sys.argv[2] if len(sys.argv) > 2 else 'BASELINE_MEASURED.json'
    rows = load(sf_dir)
    results, built = {}, {}

    def timed(name, fn, runs=2):
        best = None  # min-of-2, matching graft.Bench
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)
        print(f'[baseline] {name} {best:.3f} s', flush=True)

    def build():
        built['by_type'] = series_by(rows, lambda r: r[1])
        built['by_user'] = series_by(rows, lambda r: r[2])
        built['clicks'] = series_by(rows, lambda r: r[2],
                                    pred=lambda r: r[1] == 'click')
        built['purchases'] = series_by(rows, lambda r: r[2],
                                       pred=lambda r: r[1] == 'purchase')
        built['masked'] = series_by(
            rows, lambda r: r[2],
            val_fn=lambda r: None if r[3] is not None and r[3] < 5.0 else r[3])

    # graft queries pay a parquet scan + groupBy before the op; the
    # pypond equivalent is this split-and-construct, timed separately
    # so per-op comparisons can include or exclude it explicitly.
    timed('ts_construct', build)

    timed('ts_agg_basic', lambda: [
        (s.sum('value'), s.avg('value'), s.min('value'), s.max('value'),
         s.count()) for s in built['by_type'].values()])
    timed('ts_agg_stats', lambda: [
        (s.median('value'), s.stdev('value'), s.percentile(90, 'value'))
        for s in built['by_type'].values()])
    timed('ts_rollup_5m', lambda: [
        s.fixed_window_rollup('5m', {
            'avg_value': {'value': Functions.avg()},
            'sum_value': {'value': Functions.sum()},
            'max_value': {'value': Functions.max()},
            'n': {'value': Functions.count()}})
        for s in built['by_user'].values()])
    timed('ts_align_linear', lambda: [
        s.align('value', '1d', 'linear') for s in built['clicks'].values()])
    timed('ts_rate', lambda: [
        s.rate('value') for s in built['purchases'].values()])
    timed('ts_fill_linear', lambda: [
        s.fill('value', 'linear') for s in built['masked'].values()])
    timed('ts_quantile', lambda: [
        s.quantile(4, 'value') for s in built['by_type'].values()])
    timed('ts_percentile_methods', lambda: [
        (s.percentile(90, 'value', 'lower'),
         s.percentile(90, 'value', 'higher'),
         s.percentile(90, 'value', 'nearest'),
         s.percentile(90, 'value', 'midpoint'))
        for s in built['by_type'].values()])
    timed('ts_crop', lambda: [
        s.crop(TimeRange(1704844800000, 1705708800000))  # Jan10..Jan20 ms
        for s in built['by_user'].values()])
    # per-user merge of the click/view column series (ts_merge's shape)
    built['clicks_c'] = series_by(rows, lambda r: r[2],
                                  pred=lambda r: r[1] == 'click', col='c')
    built['views_v'] = series_by(rows, lambda r: r[2],
                                 pred=lambda r: r[1] == 'view', col='v')
    timed('ts_merge', lambda: [
        TimeSeries.timeseries_list_merge(
            dict(name=str(u)), [built['clicks_c'][u], built['views_v'][u]])
        for u in built['clicks_c'] if u in built['views_v']])

    artifact = {
        'note': ('reference (esnet/pypond) single-node wall seconds over '
                 'the events table, ops mirroring the graft queries of the '
                 'same name (same grouping/window/subset), min of 2 runs; '
                 'deps pyrsistent/humanize/tzlocal shimmed (see '
                 'tools/refbaseline/). ts_construct = splitting rows into '
                 'the grouped TimeSeries objects the ops consume; graft '
                 'query times (which include the parquet scan + groupBy) '
                 'compare against op + ts_construct.'),
        'sf_dir': sf_dir, 'rows': len(rows),
        'python_sec': results,
    }
    with open(out, 'w') as fh:
        json.dump(artifact, fh, indent=1)
    print(f'[baseline] wrote {out} ({len(rows)} rows)')


if __name__ == '__main__':
    main()
