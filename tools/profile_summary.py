"""Aggregate a jax.profiler trace into a per-op-group device-time table.

Usage:
    python tools/profile_summary.py /tmp/rf_trace [--top 25] [--iters N]

Takes the newest `*.xplane.pb` under the trace dir (as written by
``jax.profiler.start_trace`` / ``renderformer_tpu.utils.profiling.trace``),
converts it with xprof's `hlo_stats` tool, and prints:

  * self-time grouped by HLO category (fusion kinds, custom-calls, convs);
  * the top individual ops with occurrence counts.

`--iters N` divides totals by N so a trace of N identical steps reports
per-step time.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys


def find_xplane(trace_dir: str) -> str:
    pats = [os.path.join(trace_dir, 'plugins', 'profile', '*', '*.xplane.pb'),
            os.path.join(trace_dir, '*.xplane.pb')]
    files = sorted(sum((glob.glob(p) for p in pats), []),
                   key=os.path.getmtime)
    if not files:
        raise SystemExit(f'no *.xplane.pb under {trace_dir}')
    return files[-1]


def load_hlo_stats(xplane: str):
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([xplane], 'hlo_stats', {})
    if isinstance(data, bytes):
        data = data.decode()
    tab = json.loads(data)
    cols = [c['id'] for c in tab['cols']]
    rows = [[c['v'] if isinstance(c, dict) else c for c in r['c']]
            for r in tab['rows']]
    return [dict(zip(cols, r)) for r in rows]


_GROUP_RULES = [
    (r'fused_attention|flash', 'pallas flash attention'),
    (r'custom-call', 'custom-call (pallas)'),
    (r'convolution|conv', 'convolution'),
    (r'all-reduce|all-gather|reduce-scatter|collective', 'collectives'),
    (r'copy|transpose|bitcast', 'layout copies'),
    (r'rsqrt|norm', 'norms'),
    (r'dot|matmul', 'matmul fusions'),
    (r'gather|dynamic-slice|scatter', 'gather/slice'),
    (r'reduce', 'reductions'),
]


def group_of(row) -> str:
    cat = (row.get('category') or '').lower()
    name = (row.get('hlo_op_name') or '').lower()
    expr = (row.get('hlo_op_expression') or '').lower()
    # the op's own expression looks like "%name = <type> custom-call(...)";
    # matching the whole expression would also catch every op that merely
    # CONSUMES a custom-call result, inflating that group
    own = expr.split('(', 1)[0]
    for pat, label in _GROUP_RULES:
        if re.search(pat, name) or re.search(pat, cat) or (
                pat == r'custom-call' and re.search(pat, own)):
            return label
    return cat or 'other'


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('trace_dir')
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--iters', type=int, default=1,
                    help='trace contains N identical steps; report per-step')
    args = ap.parse_args(argv)

    rows = load_hlo_stats(find_xplane(args.trace_dir))
    scale = 1.0 / max(args.iters, 1)

    by_group = collections.Counter()
    total = 0.0
    for r in rows:
        t = float(r.get('total_self_time') or 0.0) * scale
        by_group[group_of(r)] += t
        total += t

    print(f'device self time: {total / 1e3:.3f} ms'
          + (f' per step ({args.iters} steps traced)' if args.iters > 1
             else ''))
    print(f'{"group":<28} {"ms":>9} {"%":>6}')
    for g, t in by_group.most_common():
        print(f'{g:<28} {t / 1e3:>9.3f} {100 * t / total:>5.1f}%')

    print(f'\ntop {args.top} ops by self time:')
    print(f'{"op":<52} {"n":>5} {"ms":>9} {"%":>6}')
    rows.sort(key=lambda r: -float(r.get('total_self_time') or 0))
    for r in rows[:args.top]:
        t = float(r.get('total_self_time') or 0.0) * scale
        n = int(float(r.get('occurrences') or 0))
        name = (r.get('hlo_op_name') or '?')[:52]
        print(f'{name:<52} {n:>5} {t / 1e3:>9.3f} {100 * t / total:>5.1f}%')


if __name__ == '__main__':
    sys.exit(main())
