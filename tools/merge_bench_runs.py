"""Merge N serialized `bench_vs_duckdb.py --md` runs into the per-row-minimum
table BASELINE.md publishes.

Protocol (BASELINE.md "Measured" section, unchanged since round 4): each
engine's per-query wall time is the MINIMUM over the runs, taken from the
published two-decimal per-run tables; totals are sums of the row minima.
This rejects the host's intermittent noisy-neighbor episodes, which inflate
either engine's single pass up to ~2.5x and strike different rows in
different runs — applied identically to both engines, so it is best-of-N,
not cherry-picking a side.

Usage: python tools/merge_bench_runs.py RUN1.md RUN2.md [RUN3.md ...]
Prints the merged markdown table plus the per-run and merged totals
(steady-state, ex-kmeans, setup) to paste into BASELINE.md.
"""

from __future__ import annotations

import re
import sys

_ROW = re.compile(
    r"\| (?P<name>[^|]+?) \| (?P<spark>[0-9.]+) \| (?P<duck>[0-9.]+|—) "
    r"\| (?P<ratio>[^|]*) \| (?P<rows>[^|]*)\|"
)


def parse(path: str) -> tuple[dict[str, tuple[float, float | None, str]], list[str], float | None]:
    rows: dict[str, tuple[float, float | None, str]] = {}
    order: list[str] = []
    setup = None
    for ln in open(path):
        m = _ROW.match(ln)
        if not m:
            continue
        name = m.group("name").strip()
        spark = float(m.group("spark"))
        duck = None if m.group("duck") == "—" else float(m.group("duck"))
        if name.startswith("_index setup"):
            setup = spark
            continue
        rows[name] = (spark, duck, m.group("rows").strip())
        order.append(name)
    return rows, order, setup


def main(paths: list[str]) -> None:
    runs = [parse(p) for p in paths]
    order = runs[0][1]
    for rows, o, _ in runs[1:]:
        if set(o) != set(order):
            missing = set(order) ^ set(o)
            sys.exit(f"run row sets differ: {sorted(missing)}")
    print("| query | spark s | duckdb s | ratio | rows |")
    print("|---|---|---|---|---|")
    setups = [s for _, _, s in runs if s is not None]
    if setups:
        print(
            f"| _index setup (build-once written tables at scale)_ | "
            f"{min(setups):.2f} | — | — | |"
        )
    tot_s = tot_d = 0.0
    ex_s = ex_d = 0.0
    for name in order:
        sparks = [r[0][name][0] for r in runs]
        ducks = [r[0][name][1] for r in runs]
        nrows = runs[0][0][name][2]
        s = min(sparks)
        d = None if any(x is None for x in ducks) else min(ducks)
        # totals compare oracle-paired rows only (rows-only queries have
        # no DuckDB side to compare against)
        if d is not None:
            tot_s += s
            tot_d += d
            if name != "kmeans_clusters":
                ex_s += s
                ex_d += d
        ratio = "—" if d is None or d == 0 else f"{s / d:.1f}x"
        dtxt = "—" if d is None else f"{d:.2f}"
        print(f"| {name} | {s:.2f} | {dtxt} | {ratio} | {nrows} |")
    print()
    for p, (rows, o, s) in zip(paths, runs):
        rs = sum(v[0] for v in rows.values())
        rd = sum(v[1] for v in rows.values() if v[1] is not None)
        print(f"run {p}: spark {rs:.1f} s, duckdb {rd:.1f} s ({rs / rd:.2f}x), setup {s}")
    print(
        f"per-row-min totals: steady {tot_s:.1f} s vs {tot_d:.1f} s "
        f"= {tot_s / tot_d:.2f}x; ex-kmeans {ex_s:.1f} s vs {ex_d:.1f} s "
        f"= {ex_s / ex_d:.2f}x; setup(min) {min(setups):.2f} s"
    )


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1:])
