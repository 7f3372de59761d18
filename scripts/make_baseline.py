#!/usr/bin/env python3
"""Build BASELINE.md from repeated graft.Bench runs (min per query).

Usage:
  python3 scripts/make_baseline.py <sf001_runs.jsonl> <sf01_runs.jsonl>

Each input holds one graft.Bench JSON line per steady-state run at that
scale factor; the anchor takes the per-query MIN across runs (the
repeatable number with ambient load removed).
"""
import json, sys

def best(path):
    runs = [json.loads(l) for l in open(path) if l.strip().startswith('{')]
    qs = {}
    for r in runs:
        for k, v in r['queries'].items():
            qs[k] = min(qs.get(k, 1e9), v)
    return qs, len(runs)

q001, n001 = best(sys.argv[1])
q01, n01 = best(sys.argv[2])

# union, bench order from sf0.1 first: a query present in only one
# file still gets a row (with '-' for the missing column) rather than
# crashing or silently vanishing from the table
names = list(q01.keys()) + [k for k in q001 if k not in q01]
lines = []
lines.append('# BASELINE — graft headline bench (round 9, re-anchored on regenerated testdata)\n')
lines.append('''The absolute per-query anchor for the "within 2x" gate: best of
%s steady-state runs per scale factor (per-query min — the repeatable
number with ambient load removed), `graft.Bench` methodology (one
warm-up pass per query at sf0.001 for plan analysis + codegen compile,
then each query timed exactly once per run at the bench scale, so no
timed number benefits from warmed data caches; queries materialize
through the noop SINK, not count(), so column pruning cannot drop
timed projection work).

**Machine**: 32-core Intel Xeon @ 2.10 GHz (1 thread/core), 125 GiB
RAM, OpenJDK 17.0.20, Spark 4.1.2 `local[32]`,
`spark.sql.shuffle.partitions=32`, AQE on, UTC session
(`GraftSession`). Data: driver-generated TPC-H-ish parquet
(TESTDATA.md) — sf0.01: lineitem 60k rows / documents 500 / events
10k; sf0.1: lineitem 600k / documents 5,000 / events 100k.

sf-scaling note: a ~10x data step costs well under 10x wall time on
most queries (scan-bound shapes amortize fixed job latency); the
iterative-graph and window-heavy shapes grow closest to linear.
q_triangles is the one deliberately superlinear shape: its wedge join
is bounded by m^1.5 and the sf0.1 near-dup graph is far denser (one
~4,700-node component), so ~10x edges cost ~11x wall — the documented
cost of exact triangle counting, not a plan regression.
q_prefix_jaccard is the steepest non-graph scaler (~6x per 10x): PPJoin
length+positional filters bound the candidate set, but common-prefix
group sizes still grow with corpus density — the documented set-
similarity-join cost envelope (Xiao et al. 2008), not a missing filter.

| query | sf0.01 (s) | sf0.1 (s) | sf0.1/sf0.01 |
|---|---|---|---|
''' % (f'{n001}/{n01}' if n001 != n01 else str(n001)))
for k in names:
    a, b = q001.get(k), q01.get(k)
    ratio = f'{b/a:.2f}' if a and b else '-'
    ca = f'{a:.3f}' if a is not None else '-'
    cb = f'{b:.3f}' if b is not None else '-'
    lines.append(f'| {k} | {ca} | {cb} | {ratio} |\n')
# totals over the INTERSECTION only, so the bottom-row ratio compares
# identical query sets; queries missing from one file are flagged
both = [k for k in names if k in q001 and k in q01]
if not both:
    sys.exit('no query timed at BOTH scale factors — refusing to write a baseline with no comparable totals')
tot001 = sum(q001[k] for k in both)
tot01 = sum(q01[k] for k in both)
lines.append(f'| **total ({len(both)} queries in both)** | **{tot001:.2f}** | **{tot01:.2f}** | {tot01/tot001:.2f} |\n')
only = [k for k in names if k not in both]
if only:
    lines.append(f'\nExcluded from totals (present at one scale only): {", ".join(only)}\n')
open('BASELINE.md', 'w').writelines(lines)
print('wrote BASELINE.md', len(names), 'queries; totals', round(tot001, 2), round(tot01, 2))
