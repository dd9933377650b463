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
    binding: str  # 'cores' | 'upper_bounds' | 'bandwidth'


@dataclass
class BandwidthBound:
    """Piecewise disk-bandwidth bound on the source node's throughput
    (pa/convex_solver.py:104-128): the objective additionally includes
    ``m1·θ_src + b1`` and ``m2·θ_src + b2`` — the fitted 2-segment
    read-rate curve (:func:`fit_piecewise_linear`) — so the pipeline
    rate cannot exceed what the disk delivers at the source's core
    share. Slopes must be ≥ 0 (a calibration sweep is non-decreasing in
    read parallelism; the second segment is the post-saturation flat or
    near-flat tail)."""

    source: str
    m1: float
    b1: float
    m2: float
    b2: float

    def __post_init__(self) -> None:
        if self.m1 < 0 or self.m2 < 0:
            raise ValueError("bandwidth segments must be non-decreasing (m1, m2 >= 0)")

    @classmethod
    def from_fit(cls, source: str, fit: "PiecewiseFit") -> "BandwidthBound":
        return cls(source, fit.m1, fit.b1, fit.m2, fit.b2)

    def cap(self, theta: float) -> float:
        """Max rate the disk sustains at core share ``theta`` (the concave
        envelope min of the two segments)."""
        return min(self.m1 * theta + self.b1, self.m2 * theta + self.b2)

    def required_theta(self, X: float) -> float:
        """Min source core share for rate X under the curve alone: the
        inverse of :meth:`cap` — max over segments of (X−b)/m, with a
        zero-slope segment acting as a hard rate cap (inf when X > b)."""
        need = 0.0
        for m, b in ((self.m1, self.b1), (self.m2, self.b2)):
            if m > 0:
                need = max(need, (X - b) / m)
            elif X > b + 1e-15:
                return float("inf")
        return need


def _need_theta(X: float, r, lo, hi, src_idx: int | None, bw: "BandwidthBound | None"):
    """Per-op θ required for common rate X, clipped to the box; the
    source node additionally satisfies the bandwidth rows."""
    base = X / r
    if bw is not None and src_idx is not None:
        base = base.copy()
        base[src_idx] = max(base[src_idx], bw.required_theta(X))
    return np.clip(base, lo, hi)


def max_min_throughput(
    rates: dict[str, float],
    cores_available: float,
    sequential_ops: set[str] | None = None,
    theta_min: float = 0.01,
    max_parallelism: float | None = None,
    bandwidth: BandwidthBound | None = None,
) -> LPResult:
    """Q2: allocate fractional core shares θ to equalize op throughputs.

    ``rates`` = per-core max rate per op (expected_per_core_max_rate).
    Sequential ops are capped at θ ≤ 1 (pa/convex_solver.py:91-135);
    ``max_parallelism`` caps the rest (the max_change budget analog).
    ``bandwidth`` folds the fitted piecewise disk curve into the problem
    as extra bound rows on the source node (pa/convex_solver.py:104-128):
    the achievable rate becomes min(r_src·θ, m1·θ+b1, m2·θ+b2) at the
    source, so a disk-bound pipeline no longer over-allocates θ there.
    """
    sequential_ops = sequential_ops or set()
    names = sorted(rates)
    r = np.array([max(rates[n], 1e-12) for n in names])
    hi = np.array(
        [1.0 if n in sequential_ops else (max_parallelism or cores_available) for n in names]
    )
    lo = np.full(len(names), theta_min)
    src_idx = names.index(bandwidth.source) if bandwidth and bandwidth.source in names else None
    if bandwidth is not None and src_idx is None:
        # Reference posture: no unique source match -> ignore the rows
        # (pa/convex_solver.py:107-113 "Give up, probably cached").
        bandwidth = None

    def used_for(X: float) -> float:
        return float(_need_theta(X, r, lo, hi, src_idx, bandwidth).sum())

    # Feasible X is bounded by every op at its cap: X_max = min(r*hi),
    # and by the bandwidth curve at the source's cap: g(hi_src).
    x_hi = float(np.min(r * hi))
    binding = "upper_bounds"
    if bandwidth is not None:
        bw_cap = bandwidth.cap(float(hi[src_idx]))
        if bw_cap < x_hi:
            x_hi = max(bw_cap, 0.0)
            binding = "bandwidth"
    x_lo = 0.0
    if used_for(x_hi) <= cores_available:
        X = x_hi
    else:
        binding = "cores"
        for _ in range(80):  # binary search: used_for is monotone in X
            mid = (x_lo + x_hi) / 2
            if used_for(mid) <= cores_available:
                x_lo = mid
            else:
                x_hi = mid
        X = x_lo
    theta = _need_theta(X, r, lo, hi, src_idx, bandwidth)
    rate_at = theta * r
    if bandwidth is not None:
        rate_at[src_idx] = min(rate_at[src_idx], bandwidth.cap(float(theta[src_idx])))
    achieved = float(np.min(rate_at))
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
    bandwidth: BandwidthBound | None = None,
) -> float:
    """Independent closed-form optimum of the Q2 LP — the cross-check
    formulation (reference validates its native LP against cvxpy and
    warns on mismatch, pa/graph_rewrites.py:478-484; no cvxpy/scipy in
    this container, but the problem is small enough to solve EXACTLY).

    used(X) = Σ clip(need_i(X), lo_i, hi_i) is piecewise-linear and
    monotone in X, where need_i(X) = X/r_i except the bandwidth source,
    whose need is max(X/r_src, (X−b1)/m1, (X−b2)/m2) — still
    piecewise-linear convex. Between consecutive breakpoints (the clamp
    points r·lo/r·hi plus the source's segment-switch points) every op
    sits on one fixed affine piece need_i(X) = a_i·X + c_i, so the
    binding-cores optimum solves used(X) = cores in closed form:
    X = (cores − Σ clamped − Σ c_free) / Σ a_free. No iteration, no
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
    src_idx = names.index(bandwidth.source) if bandwidth and bandwidth.source in names else None
    if bandwidth is not None and src_idx is None:
        bandwidth = None

    def used(X: float) -> float:
        return float(_need_theta(X, r, lo, hi, src_idx, bandwidth).sum())

    x_max = float(np.min(r * hi))
    if bandwidth is not None:
        x_max = min(x_max, max(bandwidth.cap(float(hi[src_idx])), 0.0))
    if used(x_max) <= cores_available:
        return x_max  # an op's cap (or the disk curve) binds before cores do
    bps = {float(b) for b in np.concatenate([r * lo, r * hi]) if 0.0 < b <= x_max}
    if bandwidth is not None:
        rs, m1, b1, m2, b2 = float(r[src_idx]), bandwidth.m1, bandwidth.b1, bandwidth.m2, bandwidth.b2
        # The source's need is the max of up to three affine pieces
        # (a·X + c): the rate line and each positive-slope segment's
        # inverse. The max switches pieces at pairwise intersections.
        pieces = [(1.0 / rs, 0.0)]
        if m1 > 0:
            pieces.append((1.0 / m1, -b1 / m1))
        if m2 > 0:
            pieces.append((1.0 / m2, -b2 / m2))
        for i in range(len(pieces)):
            for j in range(i + 1, len(pieces)):
                (ma, ca), (mb, cb) = pieces[i], pieces[j]
                if abs(ma - mb) < 1e-18:
                    continue
                x_cross = (cb - ca) / (ma - mb)
                if 0.0 < x_cross <= x_max:
                    bps.add(float(x_cross))
        # ...and where the source's clip engages (need crosses lo / hi).
        for bound in (float(lo[src_idx]), float(hi[src_idx])):
            for x_at in (rs * bound, m1 * bound + b1, m2 * bound + b2):
                if 0.0 < x_at <= x_max:
                    bps.add(float(x_at))
    prev = 0.0
    for b in sorted(bps) + [x_max]:
        if used(b) >= cores_available:
            probe = (prev + b) / 2  # interior point: affine pieces constant here
            a = 1.0 / r  # need slope per op
            c = np.zeros(len(r))  # need intercept per op
            if bandwidth is not None:
                # Which affine piece binds the source's need at the probe?
                sa, sc = max(pieces, key=lambda p: p[0] * probe + p[1])
                a[src_idx], c[src_idx] = sa, sc
            need = a * probe + c
            at_hi = need >= hi
            at_lo = need <= lo
            free = ~(at_hi | at_lo)
            fixed = float(hi[at_hi].sum() + lo[at_lo].sum())
            inv = float(a[free].sum())
            if inv <= 0:
                return b
            X = (cores_available - fixed - float(c[free].sum())) / inv
            return float(min(max(X, prev), b))
        prev = b
    return x_max


def cross_check_throughput(
    result: LPResult,
    rates: dict[str, float],
    cores_available: float,
    sequential_ops: set[str] | None = None,
    rel_tol: float = 1e-6,
    bandwidth: BandwidthBound | None = None,
    **kwargs,
) -> str | None:
    """Validate a water-filling solution against the closed-form optimum;
    returns a warning string on mismatch, None when they agree (the
    reference's warn-don't-fail posture, pa/graph_rewrites.py:478-484)."""
    exact = max_min_throughput_exact(
        rates, cores_available, sequential_ops, bandwidth=bandwidth, **kwargs
    )
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
    bandwidth: BandwidthBound | None = None,
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
    per_op = r[:, None] * theta
    if bandwidth is not None and bandwidth.source in names:
        s = names.index(bandwidth.source)
        bw_rate = np.minimum(
            bandwidth.m1 * theta[s] + bandwidth.b1, bandwidth.m2 * theta[s] + bandwidth.b2
        )
        per_op[s] = np.minimum(per_op[s], bw_rate)
    obj = per_op.min(axis=0)
    best = float(obj[feasible].max())
    steps = (hi - lo) / max(grid - 1, 1)
    resolution = float((r * steps).max())
    return best, resolution
