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


def roofline_chart(
    n_jobs: float,
    latency_r: float,
    x_cpu_bound: float,
    n_star: float,
    nodes_rates: Sequence[tuple[float, str]] | None = None,
    x_disk_bound: float | None = None,
    ylim: float | str | None = None,
    title: str = "Pipeline roofline",
) -> str:
    """The reference's roofline plot (pa/plotting_util.py:27-75
    ``generate_roofline``) in the engine's stdlib-SVG idiom: operational
    law X = N/R up to the knee at N* (jobs needed to saturate), flat at
    N*/R beyond it; dashed horizontals for the LP compute bound and the
    optional disk bound; vertical markers at the CURRENT parallelism N
    and the saturation point N*; optional per-node ceiling lines
    (``(bound, name)`` pairs — the benchmark sweep's output), drawn in
    fixed-slot categorical colors, worst first like the reference's
    red-to-purple ramp. All inputs are driver-side scalars produced by
    the q30 roofline rollup / Q2 LP — nothing here touches data.

    Returns the SVG text; see :func:`write_roofline` for the file +
    companion-CSV form."""
    max_n = max(n_star * 2.0, n_jobs + 1.0)
    if ylim is None:
        y_hi = 2.0 * x_cpu_bound
    elif ylim == "all":
        y_hi = max([b for b, _ in (nodes_rates or [])] + [x_cpu_bound]) + 1.0
    else:
        y_hi = float(ylim)
    nodes = [
        (b, name) for b, name in (nodes_rates or []) if b < y_hi
    ]
    if len(nodes) > _MAX_SERIES:
        nodes = sorted(nodes)[:_MAX_SERIES]  # worst (lowest ceiling) first

    px_w, px_h = _W - _ML - _MR, _H - _MT - _MB
    x_lo, x_hi_ = 0.0, max_n
    y_lo = 0.0

    def sx(x: float) -> float:
        return _ML + (x - x_lo) / (x_hi_ - x_lo) * px_w

    def sy(y: float) -> float:
        return _MT + (1 - (y - y_lo) / (y_hi - y_lo)) * px_h

    o = io.StringIO()
    o.write(
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" font-family="system-ui, sans-serif">\n'
        f'<rect width="{_W}" height="{_H}" fill="{_SURFACE}"/>\n'
        f'<text x="{_ML}" y="24" font-size="15" font-weight="600" '
        f'fill="{_TEXT}">{_esc(title)}</text>\n'
    )
    for t in _ticks(y_lo, y_hi):
        y = sy(t)
        o.write(f'<line x1="{_ML}" y1="{y:.1f}" x2="{_W - _MR}" y2="{y:.1f}" stroke="{_GRID}" stroke-width="1"/>\n')
        o.write(f'<text x="{_ML - 8}" y="{y + 4:.1f}" font-size="11" text-anchor="end" fill="{_TEXT_2}">{_fmt(t)}</text>\n')
    for t in _ticks(x_lo, x_hi_, n=6):
        o.write(f'<text x="{sx(t):.1f}" y="{_H - _MB + 18}" font-size="11" text-anchor="middle" fill="{_TEXT_2}">{_fmt(t)}</text>\n')
    o.write(
        f'<text x="{_ML + px_w / 2:.0f}" y="{_H - 26}" font-size="12" text-anchor="middle" fill="{_TEXT_2}">N (jobs in system)</text>\n'
        f'<text x="16" y="{_MT + px_h / 2:.0f}" font-size="12" text-anchor="middle" fill="{_TEXT_2}" '
        f'transform="rotate(-90 16 {_MT + px_h / 2:.0f})">X (minibatches/second)</text>\n'
    )
    # the roofline itself: rising segment X=N/R to the knee, then flat
    knee_y = n_star / max(latency_r, 1e-12)
    o.write(
        f'<path d="M{sx(0):.1f},{sy(0):.1f} L{sx(n_star):.1f},{sy(min(knee_y, y_hi)):.1f} '
        f'L{sx(max_n):.1f},{sy(min(knee_y, y_hi)):.1f}" fill="none" '
        f'stroke="{_TEXT}" stroke-width="2"/>\n'
    )
    # LP compute bound + optional disk bound: dashed neutral horizontals
    for val, name, dash in (
        (x_cpu_bound, f"LP Compute Bound ({x_cpu_bound:.1f})", "6 4"),
        *(
            ((x_disk_bound, f"Disk Bound ({x_disk_bound:.1f})", "2 3"),)
            if x_disk_bound is not None  # 0.0 is a legitimate bound; match write_roofline
            else ()
        ),
    ):
        y = sy(min(val, y_hi))
        o.write(
            f'<line x1="{_ML}" y1="{y:.1f}" x2="{_W - _MR}" y2="{y:.1f}" '
            f'stroke="{_BASELINE}" stroke-width="1.5" stroke-dasharray="{dash}"/>\n'
            f'<text x="{_W - _MR - 4}" y="{y - 5:.1f}" font-size="11" '
            f'text-anchor="end" fill="{_TEXT_2}">{_esc(name)}</text>\n'
        )
    # per-node ceilings (the sweep's per-op bounds), fixed-slot colors
    for i, (bound, name) in enumerate(nodes):
        y = sy(bound)
        c = _SERIES_COLORS[i % _MAX_SERIES]
        o.write(
            f'<line x1="{_ML}" y1="{y:.1f}" x2="{_W - _MR}" y2="{y:.1f}" '
            f'stroke="{c}" stroke-width="1.5" stroke-dasharray="4 3"/>\n'
            f'<text x="{_ML + 4}" y="{y - 4:.1f}" font-size="11" fill="{c}">{_esc(name)} ({_fmt(round(bound, 2))})</text>\n'
        )
    # current N and saturation N*: vertical drop lines + star markers
    for x_val, y_val, name, color in (
        (n_jobs, min(n_jobs / max(latency_r, 1e-12), x_cpu_bound), f"N={n_jobs:.2f}", _SERIES_COLORS[0]),
        (n_star, knee_y, f"N*={n_star:.2f}", _TEXT),
    ):
        y_clip = min(y_val, y_hi)
        o.write(
            f'<line x1="{sx(x_val):.1f}" y1="{sy(0):.1f}" x2="{sx(x_val):.1f}" y2="{sy(y_clip):.1f}" '
            f'stroke="{color}" stroke-width="1.5" stroke-dasharray="5 4"/>\n'
            f'<path d="M{sx(x_val):.1f},{sy(y_clip) - 7:.1f} l2.1,4.2 4.6,.7 -3.3,3.2 .8,4.6 '
            f'-4.2,-2.2 -4.2,2.2 .8,-4.6 -3.3,-3.2 4.6,-.7 z" fill="{color}">'
            f'<title>{_esc(name)}: X={_fmt(round(y_val, 3))}</title></path>\n'
            f'<text x="{sx(x_val) + 6:.1f}" y="{_H - _MB - 6}" font-size="11" fill="{_TEXT_2}">{_esc(name)}</text>\n'
        )
    o.write("</svg>\n")
    return o.getvalue()


def write_roofline(
    path: str,
    n_jobs: float,
    latency_r: float,
    x_cpu_bound: float,
    n_star: float,
    nodes_rates: Sequence[tuple[float, str]] | None = None,
    x_disk_bound: float | None = None,
    ylim: float | str | None = None,
    title: str = "Pipeline roofline",
) -> tuple[str, str]:
    """File form of :func:`roofline_chart`: writes ``<path>.svg`` plus
    the companion ``<path>.csv`` of every plotted bound (the accessible
    table view, same contract as :func:`write_report`)."""
    base = path[:-4] if path.endswith(".svg") else path
    svg_path, csv_path = base + ".svg", base + ".csv"
    with open(svg_path, "w") as f:
        f.write(
            roofline_chart(
                n_jobs, latency_r, x_cpu_bound, n_star,
                nodes_rates=nodes_rates, x_disk_bound=x_disk_bound,
                ylim=ylim, title=title,
            )
        )
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["kind", "name", "value"])
        w.writerow(["point", "N", n_jobs])
        w.writerow(["point", "N_star", n_star])
        w.writerow(["scalar", "latency_R", latency_r])
        w.writerow(["bound", "X_cpu", x_cpu_bound])
        if x_disk_bound is not None:
            w.writerow(["bound", "X_disk", x_disk_bound])
        for bound, name in nodes_rates or []:
            w.writerow(["node_ceiling", name, bound])
    return svg_path, csv_path
