"""Throughput / cost optimization (Q2, Q3, Q11).

The reference solves these with a native LP plus a cvxpy cross-check
(pa/convex_solver.py:12-156, :158-300; cross-check
pa/graph_rewrites.py:478-484). Neither scipy nor cvxpy is in this
container, and neither is needed:

* Q2 — maximize min_i(rate_i·θ_i) s.t. Σθ ≤ cores, lo_i ≤ θ_i ≤ hi_i —
  is a water-filling problem with an exact iterative solution: at optimum
  every unclamped op runs at the common rate X, θ_i = X/rate_i; clamped
  ops sit at their bounds. We binary-search X (monotone feasibility).
* Q3 — min-cost-at-rate with ≤1 cache decision — enumerates the cache
  choices (≤ #nodes, each reducing to a closed-form θ assignment), which
  IS the exact MILP solution for a single binary decision row.
* Q11 — 2-segment piecewise-linear fit via numpy lstsq with the same
  one-sided-error grid search over split points
  (pa/bandwidth_utilities.py:7-27,41-77).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class LPResult:
    thetas: dict[str, float]
    min_rate: float  # the maximized bottleneck throughput
    cores_used: float
    binding: str  # 'cores' | 'upper_bounds'


def max_min_throughput(
    rates: dict[str, float],
    cores_available: float,
    sequential_ops: set[str] | None = None,
    theta_min: float = 0.01,
    max_parallelism: float | None = None,
) -> LPResult:
    """Q2: allocate fractional core shares θ to equalize op throughputs.

    ``rates`` = per-core max rate per op (expected_per_core_max_rate).
    Sequential ops are capped at θ ≤ 1 (pa/convex_solver.py:91-135);
    ``max_parallelism`` caps the rest (the max_change budget analog).
    """
    sequential_ops = sequential_ops or set()
    names = sorted(rates)
    r = np.array([max(rates[n], 1e-12) for n in names])
    hi = np.array(
        [1.0 if n in sequential_ops else (max_parallelism or cores_available) for n in names]
    )
    lo = np.full(len(names), theta_min)

    def used_for(X: float) -> float:
        theta = np.clip(X / r, lo, hi)
        return float(theta.sum())

    # Feasible X is bounded by every op at its cap: X_max = min(r*hi).
    x_hi = float(np.min(r * hi))
    x_lo = 0.0
    if used_for(x_hi) <= cores_available:
        X = x_hi
        binding = "upper_bounds"
    else:
        binding = "cores"
        for _ in range(80):  # binary search: used_for is monotone in X
            mid = (x_lo + x_hi) / 2
            if used_for(mid) <= cores_available:
                x_lo = mid
            else:
                x_hi = mid
        X = x_lo
    theta = np.clip(X / r, lo, hi)
    achieved = float(np.min(theta * r))
    return LPResult(
        thetas={n: float(t) for n, t in zip(names, theta)},
        min_rate=achieved,
        cores_used=float(theta.sum()),
        binding=binding,
    )


@dataclass
class CostResult:
    thetas: dict[str, float]
    cache_at: str | None
    cost_per_hour: float
    feasible: bool


def min_cost_at_rate(
    rates: dict[str, float],
    topo_order: list[str],
    min_rate: float,
    cost_vcpu_hour: float,
    cost_gb_ram_hour: float,
    cacheable_sizes: dict[str, float] | None = None,
    upstream_of: dict[str, set[str]] | None = None,
) -> CostResult:
    """Q3: minimize Σθ·c_cpu + cache_size·c_mem s.t. pipeline rate ≥
    min_rate, at most one cache (pa/convex_solver.py:158-300).

    A cache at node c relaxes every op upstream of c (steady-state reads
    come from the cache, pa/convex_solver.py cache-mask rows): those θ
    drop to 0. Exact by enumeration over the single binary decision.
    """
    cacheable_sizes = cacheable_sizes or {}
    upstream_of = upstream_of or {}

    def cost_for(cache_at: str | None) -> tuple[float, dict[str, float], bool]:
        skip = upstream_of.get(cache_at, set()) | ({cache_at} if cache_at else set())
        thetas = {}
        feasible = True
        for n in topo_order:
            if n in skip:
                thetas[n] = 0.0
                continue
            r = max(rates.get(n, 1e-12), 1e-12)
            thetas[n] = min_rate / r  # cheapest feasible share
        cpu = sum(thetas.values()) * cost_vcpu_hour
        mem = (cacheable_sizes.get(cache_at, 0.0) / (1 << 30)) * cost_gb_ram_hour if cache_at else 0.0
        return cpu + mem, thetas, feasible

    candidates: list[str | None] = [None] + [c for c in cacheable_sizes]
    best = None
    for c in candidates:
        cost, thetas, feasible = cost_for(c)
        if feasible and (best is None or cost < best[0]):
            best = (cost, thetas, c)
    cost, thetas, c = best
    return CostResult(thetas=thetas, cache_at=c, cost_per_hour=cost, feasible=True)


@dataclass
class PiecewiseFit:
    m1: float
    b1: float
    m2: float
    b2: float
    x_thresh: float

    def predict(self, x: float) -> float:
        return self.m1 * x + self.b1 if x <= self.x_thresh else self.m2 * x + self.b2


def fit_piecewise_linear(xs: list[float], ys: list[float]) -> PiecewiseFit:
    """Q11: 2-segment least squares; split chosen by grid search minimizing
    summed segment residuals (pa/bandwidth_utilities.py:41-77). Used on the
    (read parallelism, rate) calibration sweep
    (pa/pipeline_optimizer_wrapper.py:365-459)."""
    x = np.asarray(xs, dtype=float)
    y = np.asarray(ys, dtype=float)
    order = np.argsort(x)
    x, y = x[order], y[order]
    n = len(x)
    if n < 4:
        m, b = np.polyfit(x, y, 1)
        return PiecewiseFit(float(m), float(b), float(m), float(b), float(x[-1]))

    def seg_fit(xi, yi):
        if len(set(xi.tolist())) < 2:
            return 0.0, float(np.mean(yi)), float(np.sum((yi - np.mean(yi)) ** 2))
        m, b = np.polyfit(xi, yi, 1)
        resid = float(np.sum((yi - (m * xi + b)) ** 2))
        return float(m), float(b), resid

    best = None
    for split in range(2, n - 1):
        m1, b1, e1 = seg_fit(x[:split], y[:split])
        m2, b2, e2 = seg_fit(x[split:], y[split:])
        err = e1 + e2
        if best is None or err < best[0]:
            best = (err, m1, b1, m2, b2, float(x[split - 1]))
    _, m1, b1, m2, b2, x_thresh = best
    return PiecewiseFit(m1, b1, m2, b2, x_thresh)
