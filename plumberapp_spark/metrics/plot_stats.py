"""Benchmark comparison-report sink — the engine's analog of the
reference's microbenchmark plotting tool (microbenchmarks/plot_stats.py:
125-206 ``plot_benchmark_stats``/``plot_benchmark_rates``, 208-282
``plot_estimated_max_rate``, 302-329 ``create_mega_df``, 37-50
``add_baseline(s)``): throughput-vs-rewrite-step charts comparing the
observed rate against the LP-estimated max rate, with dashed horizontal
baselines (the reference's Autotune/Heuristic axhlines), and a
multi-trial aggregate keyed by strategy.

Differences from the reference, on purpose:

* output is self-contained SVG rendered with the stdlib (matplotlib /
  seaborn are not in this container; an SVG file needs no backend and
  diffs cleanly in review),
* every chart ships with a companion CSV of the exact plotted values —
  the accessible "table view" of the same data, and what a downstream
  notebook would re-plot,
* inputs are the engine's own artifacts — ``StepLog`` lists from
  ``run_rewriter_loop`` or their ``logs_to_df`` DataFrames — not log
  files scraped with line heuristics (mb/plot_stats.py:52-88).

Driver-side by contract: a step log is bounded by ``num_steps`` (tens of
rows), so the ``.collect()`` here is plan-sized, never data-sized.

Colors are the fixed-order categorical slots of the validated default
palette (blue/orange/aqua/yellow/magenta); baselines are neutral gray so
they never read as a data series.
"""

from __future__ import annotations

import csv
import io
import math
from typing import Iterable, Mapping, Sequence

# Fixed-order categorical slots (validated palette, light surface).
# Assigned to series in order, never cycled: a 6th series is the
# caller's cue to aggregate, not ours to invent a hue for.
_SERIES_COLORS = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4"]
_MAX_SERIES = len(_SERIES_COLORS)
_SURFACE = "#fcfcfb"
_TEXT = "#0b0b0b"
_TEXT_2 = "#52514e"
_GRID = "#e4e3df"
_BASELINE = "#8a8984"

_W, _H = 720, 440
_ML, _MR, _MT, _MB = 64, 16, 44, 64  # margins: left/right/top/bottom


def _series_points(obj) -> list[tuple[float, float]]:
    """Normalize one series: StepLog list, (x, y) pairs, or a DataFrame
    with (step, global_minibatch_rate) — the ``logs_to_df`` schema."""
    if hasattr(obj, "toPandas"):  # pyspark DataFrame (bounded by contract)
        rows = obj.select("step", "global_minibatch_rate").collect()
        return sorted((float(r[0]), float(r[1])) for r in rows)
    out = []
    for item in obj:
        if hasattr(item, "step") and hasattr(item, "rate"):  # StepLog
            out.append((float(item.step), float(item.rate)))
        else:
            x, y = item
            out.append((float(x), float(y)))
    return sorted(out)


def _ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    if hi <= lo:
        hi = lo + 1.0
    raw = (hi - lo) / max(n - 1, 1)
    mag = 10 ** math.floor(math.log10(raw))
    step = mag * 10
    for mult in (1, 2, 2.5, 5, 10):
        if mag * mult >= raw:
            step = mag * mult
            break
    start = step * math.floor(lo / step)
    ticks, v = [], start
    while v <= hi + step * 1e-9:
        if v >= lo - step * 1e-9:
            ticks.append(round(v, 10))
        v += step
    return ticks or [lo, hi]


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e6:
        return str(int(v))
    return f"{v:.4g}"


def svg_line_chart(
    series: Mapping[str, Iterable],
    baselines: Mapping[str, float] | None = None,
    title: str = "",
    xlabel: str = "Step",
    ylabel: str = "Throughput (elements/s)",
    mark_max: bool = True,
) -> str:
    """Render an SVG line chart (2px lines, 8px markers, recessive grid,
    legend row, dashed gray baselines). ``series`` maps name → points
    (see :func:`_series_points`); ≤ 5 series by fixed-slot contract."""
    names = list(series)
    if len(names) > _MAX_SERIES:
        raise ValueError(
            f"at most {_MAX_SERIES} series per chart (got {len(names)}); "
            "aggregate or split into small multiples"
        )
    data = {name: _series_points(series[name]) for name in names}
    baselines = dict(baselines or {})

    xs = [p[0] for pts in data.values() for p in pts]
    ys = [p[1] for pts in data.values() for p in pts] + list(baselines.values())
    if not xs:
        xs, ys = [0.0, 1.0], ys or [0.0, 1.0]
    x_lo, x_hi = min(xs), max(xs)
    y_lo, y_hi = min(ys + [0.0]), max(ys)
    if x_hi == x_lo:
        x_hi = x_lo + 1
    if y_hi == y_lo:
        y_hi = y_lo + 1
    y_hi *= 1.06  # headroom so the top marker is not clipped

    px_w, px_h = _W - _ML - _MR, _H - _MT - _MB

    def sx(x: float) -> float:
        return _ML + (x - x_lo) / (x_hi - x_lo) * px_w

    def sy(y: float) -> float:
        return _MT + (1 - (y - y_lo) / (y_hi - y_lo)) * px_h

    o = io.StringIO()
    o.write(
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" font-family="system-ui, sans-serif">\n'
        f'<rect width="{_W}" height="{_H}" fill="{_SURFACE}"/>\n'
    )
    if title:
        o.write(
            f'<text x="{_ML}" y="24" font-size="15" font-weight="600" '
            f'fill="{_TEXT}">{_esc(title)}</text>\n'
        )
    # recessive grid + y ticks
    for t in _ticks(y_lo, y_hi):
        y = sy(t)
        o.write(f'<line x1="{_ML}" y1="{y:.1f}" x2="{_W - _MR}" y2="{y:.1f}" stroke="{_GRID}" stroke-width="1"/>\n')
        o.write(f'<text x="{_ML - 8}" y="{y + 4:.1f}" font-size="11" text-anchor="end" fill="{_TEXT_2}">{_fmt(t)}</text>\n')
    for t in _ticks(x_lo, x_hi, n=min(6, int(x_hi - x_lo) + 2)):
        x = sx(t)
        o.write(f'<text x="{x:.1f}" y="{_H - _MB + 18}" font-size="11" text-anchor="middle" fill="{_TEXT_2}">{_fmt(t)}</text>\n')
    # axis labels (text tokens, never series color)
    o.write(
        f'<text x="{_ML + px_w / 2:.0f}" y="{_H - 26}" font-size="12" text-anchor="middle" fill="{_TEXT_2}">{_esc(xlabel)}</text>\n'
        f'<text x="16" y="{_MT + px_h / 2:.0f}" font-size="12" text-anchor="middle" fill="{_TEXT_2}" '
        f'transform="rotate(-90 16 {_MT + px_h / 2:.0f})">{_esc(ylabel)}</text>\n'
    )
    # baselines: dashed neutral gray, labeled at the right edge
    for bname, bval in baselines.items():
        y = sy(bval)
        o.write(
            f'<line x1="{_ML}" y1="{y:.1f}" x2="{_W - _MR}" y2="{y:.1f}" '
            f'stroke="{_BASELINE}" stroke-width="1.5" stroke-dasharray="6 4"/>\n'
            f'<text x="{_W - _MR - 4}" y="{y - 5:.1f}" font-size="11" '
            f'text-anchor="end" fill="{_TEXT_2}">{_esc(bname)}</text>\n'
        )
    # series: 2px lines, 8px (r=4) markers; max point ringed in surface
    for i, name in enumerate(names):
        pts, color = data[name], _SERIES_COLORS[i]
        if not pts:
            continue
        path = " ".join(f"{'M' if j == 0 else 'L'}{sx(x):.1f},{sy(y):.1f}" for j, (x, y) in enumerate(pts))
        o.write(f'<path d="{path}" fill="none" stroke="{color}" stroke-width="2"/>\n')
        for x, y in pts:
            o.write(f'<circle cx="{sx(x):.1f}" cy="{sy(y):.1f}" r="4" fill="{color}"><title>{_esc(name)} step {_fmt(x)}: {_fmt(y)}</title></circle>\n')
        if mark_max:
            mx, my = max(pts, key=lambda p: p[1])
            o.write(
                f'<circle cx="{sx(mx):.1f}" cy="{sy(my):.1f}" r="6" fill="{color}" '
                f'stroke="{_SURFACE}" stroke-width="2"><title>max {_esc(name)}: {_fmt(my)}</title></circle>\n'
            )
    # legend row (always present for >= 2 series; title names a single one)
    if len(names) >= 2:
        x = _ML
        for i, name in enumerate(names):
            o.write(
                f'<circle cx="{x + 5}" cy="{_MT - 12}" r="5" fill="{_SERIES_COLORS[i]}"/>\n'
                f'<text x="{x + 14}" y="{_MT - 8}" font-size="12" fill="{_TEXT}">{_esc(name)}</text>\n'
            )
            x += 24 + 7 * len(name)
    o.write("</svg>\n")
    return o.getvalue()


def _esc(s: str) -> str:
    return str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def rewriter_report(
    logs,
    estimated: Mapping[str, Iterable] | None = None,
    baselines: Mapping[str, float] | None = None,
    title: str = "Rewriter throughput by step",
) -> str:
    """The ``plot_benchmark_rates`` + ``plot_estimated_max_rate`` analog
    (mb/plot_stats.py:181-206, 208-282): observed rate per rewrite step,
    optionally overlaid with estimate series (e.g. the Q2 LP bound per
    step) and dashed reference baselines. Returns the SVG text."""
    series: dict = {"Observed Rate": logs}
    for k, v in (estimated or {}).items():
        series[k] = v
    return svg_line_chart(series, baselines=baselines, title=title)


def comparison_report(
    trials: Mapping[str, Sequence],
    baselines: Mapping[str, float] | None = None,
    title: str = "Strategy comparison (mean over trials)",
) -> str:
    """The mega-df aggregate (mb/plot_stats.py:302-329 + the final
    strategy-hued lineplot, 377-391): each key is a strategy, each value
    a list of trials (each a StepLog list / point list / logs DataFrame);
    plots the per-step MEAN rate per strategy. Hue follows the strategy
    name's insertion order — filtering trials never repaints survivors."""
    series = {}
    for strategy, runs in trials.items():
        acc: dict[float, list[float]] = {}
        for run in runs:
            for x, y in _series_points(run):
                acc.setdefault(x, []).append(y)
        series[strategy] = sorted((x, sum(v) / len(v)) for x, v in acc.items())
    return svg_line_chart(series, baselines=baselines, title=title)


def write_report(
    path: str,
    logs,
    estimated: Mapping[str, Iterable] | None = None,
    baselines: Mapping[str, float] | None = None,
    title: str = "Rewriter throughput by step",
) -> tuple[str, str]:
    """Write ``<path>.svg`` and the companion ``<path>.csv`` table of the
    exact plotted values (the accessible view of the same data). Returns
    the two paths written."""
    base = path[:-4] if path.endswith(".svg") else path
    svg_path, csv_path = base + ".svg", base + ".csv"
    series: dict = {"Observed Rate": logs}
    for k, v in (estimated or {}).items():
        series[k] = v
    with open(svg_path, "w") as f:
        f.write(svg_line_chart(series, baselines=baselines, title=title))
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["series", "step", "rate"])
        for name, obj in series.items():
            for x, y in _series_points(obj):
                w.writerow([name, _fmt(x), y])
        for name, val in (baselines or {}).items():
            w.writerow([f"baseline:{name}", "", val])
    return svg_path, csv_path
