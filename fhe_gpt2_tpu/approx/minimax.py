"""Minimax composite approximations: sign, ReLU, GELU, max.

Functional counterpart of the reference's comp/ layer (minimax_ReLU_seal,
SEALcomp.cpp:3; composite planner program.cpp) and of its hardcoded
coefficient tables (cnn_ckks/result/d13.txt, PolyApprox.cpp sign/GELU
constants): instead of shipping precomputed text files, every table is
generated here by the Remez machinery (approx/remez.py) and cached.

sign(x) is approximated by a composition p_k ∘ ... ∘ p_1 of odd minimax
polynomials (Lee et al.): p_1 maps [eps,1] into [1-e_1, 1+e_1], each later
stage tightens the band; ReLU(x) = x·(1+sign(x))/2.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
from mpmath import mp, mpf, erf, sqrt, exp as mp_exp

from .remez import ChebPoly, remez, to_float_coeffs

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "_cache")

# Degree schedules keyed by (log2(1/eps) domain gap). Each odd minimax stage
# amplifies the gap by ~deg (slope at the origin), so reaching error 2^-a
# from gap 2^-g needs roughly prod(d_i) >= 2^g times a high-degree finishing
# stage. (The reference labels its {15,15,27} table "alpha=13"
# (infer_seal.cpp:268, result/d13.txt); measured on true minimax stages that
# schedule needs gap >= ~2^-6 to converge, so we key schedules by gap and
# offer auto_schedule() for arbitrary targets.)
DEGREE_SCHEDULES = {
    4: [15, 27],
    6: [15, 15, 27],
    8: [15, 15, 15, 27],
    10: [15, 15, 15, 15, 27],
    13: [31, 31, 31, 27],
}


@dataclass
class SignComposite:
    """Composition of odd Chebyshev polys approximating sign on ±[eps, 1]."""

    stages: list          # list of ChebPoly (odd)
    eps: float
    err: float            # final band half-width: |p(x) - sign(x)| <= err

    def __call__(self, x):
        """Float evaluation (simulator path)."""
        y = np.asarray(x, dtype=np.float64)
        for p in self.stages:
            y = eval_cheb_float(p, y)
        return y

    def stage_tables(self):
        """Per-stage float64 Chebyshev coefficient arrays + domains."""
        return [
            (to_float_coeffs(p), float(p.lo), float(p.hi)) for p in self.stages
        ]


def eval_cheb_float(p: ChebPoly, x: np.ndarray) -> np.ndarray:
    """Clenshaw in float64 (numpy), for the plaintext simulator."""
    lo, hi = float(p.lo), float(p.hi)
    t = (2.0 * x - hi - lo) / (hi - lo)
    c = to_float_coeffs(p)
    b1 = np.zeros_like(t)
    b2 = np.zeros_like(t)
    for ck in c[:0:-1]:
        b1, b2 = 2.0 * t * b1 - b2 + ck, b1
    return t * b1 - b2 + c[0]


def _cache_path(name: str) -> str:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    return os.path.join(_CACHE_DIR, name + ".json")


def _save_stages(path, stages, eps, err):
    data = {
        "eps": eps, "err": err,
        "stages": [
            {"coeffs": [float(c) for c in p.coeffs],
             "lo": float(p.lo), "hi": float(p.hi)}
            for p in stages
        ],
    }
    with open(path, "w") as f:
        json.dump(data, f)


def _load_stages(path):
    with open(path) as f:
        data = json.load(f)
    stages = [
        ChebPoly([mpf(c) for c in s["coeffs"]], mpf(s["lo"]), mpf(s["hi"]))
        for s in data["stages"]
    ]
    return SignComposite(stages=stages, eps=data["eps"], err=data["err"])


def sign_composite(alpha: int = 13, eps: float = 2 ** -6,
                   degrees=None, prec_dps: int = 80,
                   use_cache: bool = True) -> SignComposite:
    """Generate (or load) a composite minimax sign: |p(x)-sgn(x)| small on
    ±[eps, 1]. With degrees=None, stages are chosen automatically until the
    error reaches 2^-alpha (auto_schedule)."""
    if degrees is None:
        return auto_schedule(target_err=2.0 ** -alpha, eps=eps,
                             prec_dps=prec_dps, use_cache=use_cache)
    name = f"sign_a{alpha}_e{eps:.3e}_d{'_'.join(map(str, degrees))}"
    path = _cache_path(name)
    if use_cache and os.path.exists(path):
        return _load_stages(path)
    a, b = mpf(eps), mpf(1)
    stages = []
    err = mpf(0)
    for d in degrees:
        p, err = _sign_stage(a, b, d, prec_dps)
        stages.append(p)
        a, b = 1 - err, 1 + err
    out = SignComposite(stages=stages, eps=eps, err=float(err))
    _save_stages(path, stages, eps, float(err))
    return out


def _sign_stage(a, b, d, prec_dps):
    """One odd minimax stage toward sign on [a, b] (mirror-extended)."""
    return remez(lambda x: mpf(1), [(a, b)], d, odd=True, prec_dps=prec_dps,
                 func_np=lambda x: np.ones_like(np.asarray(x, float)))


def auto_schedule(target_err: float, eps: float, stage_deg: int = 27,
                  max_stages: int = 12, prec_dps: int = 80,
                  use_cache: bool = True) -> SignComposite:
    """Grow the composition stage by stage until the band reaches target_err.

    Fixed per-stage degree; see dp_schedule for the cost-optimal planner
    (the upgrade_oddbaby counterpart).
    """
    name = f"sign_auto_t{target_err:.3e}_e{eps:.3e}_d{stage_deg}"
    path = _cache_path(name)
    if use_cache and os.path.exists(path):
        return _load_stages(path)
    a, b = mpf(eps), mpf(1)
    stages = []
    err = mpf(1)
    for _ in range(max_stages):
        p, err = _sign_stage(a, b, stage_deg, prec_dps)
        stages.append(p)
        a, b = 1 - err, 1 + err
        if float(err) <= target_err:
            break
    out = SignComposite(stages=stages, eps=eps, err=float(err))
    _save_stages(path, stages, eps, float(err))
    return out


# ---------------------------------------------------------------------------
# DP composite planner (the counterpart of the reference's upgrade_oddbaby /
# upgrade_baby dynamic programs, comp/program.cpp:3-158): choose per-stage
# degrees minimizing (multiplicative depth, then ct-multiplications) of the
# WHOLE composition as evaluated by this framework's Chebyshev BSGS engine.
# ---------------------------------------------------------------------------

class _CostBackend:
    """Backend whose values are depths; counts multiplications. Running a
    ChebEvalPlan through it measures the plan's true cost on this engine
    (instead of assuming an analytic mult/depth formula)."""

    def __init__(self):
        self.mults = 0

    def mul(self, a, b):
        self.mults += 1
        return max(a, b) + 1

    def square(self, a):
        self.mults += 1
        return a + 1

    def mul_const(self, a, c, out_scale=None):
        # Integer constants are exact multiplies on the real engine (no
        # rescale, no level — CkksBackend.mul_const → mul_const_int); cost
        # them the same way or every ×2 in the Chebyshev ladders charges a
        # phantom level and the DP overestimates stage depth ~2×.
        if out_scale is None and float(c) == int(c) and abs(c) < 2 ** 40:
            return a
        return a + 1

    def mul_plain(self, a, v, out_scale=None):
        return a + 1

    def add(self, a, b):
        return max(a, b)

    def sub(self, a, b):
        return max(a, b)

    def neg(self, a):
        return a

    def add_const(self, a, c):
        return a

    def scale_of(self, a):
        return None


def stage_cost(degree: int) -> tuple[int, int]:
    """(depth, ct-mults) of one degree-`degree` odd stage on this engine."""
    from .chebeval import make_plan, eval_plan
    plan = make_plan(np.ones(degree + 1), -1.0, 1.0)
    B = _CostBackend()
    depth = eval_plan(B, plan, 0)
    return int(depth), int(B.mults)


def _stage_err_table(d: int, log2e: float, first: bool,
                     prec_dps: int) -> float:
    """Cached stage output band: log2 of the minimax error of one degree-d
    odd stage. `first` stages act on the sign gap band [e, 1] (e = eps);
    later stages act on the unit band [1-e, 1+e]."""
    path = _cache_path("sign_stage_errs")
    tab = {}
    if os.path.exists(path):
        with open(path) as f:
            tab = json.load(f)
    key = f"{d}_{log2e:.2f}_{int(first)}_{prec_dps}"
    if key in tab:
        return tab[key]
    e = mpf(2) ** mpf(log2e)
    a, b = (e, mpf(1)) if first else (1 - e, 1 + e)
    _, err = _sign_stage(a, b, d, prec_dps)
    import math
    v = float(math.log2(float(err))) if err > 0 else -prec_dps * 3.3
    tab[key] = v
    with open(path, "w") as f:
        json.dump(tab, f)
    return v


def dp_schedule(target_err: float, eps: float,
                degrees=(7, 15, 27, 31, 63), prec_dps: int = 80,
                grid: float = 0.25, use_cache: bool = True) -> SignComposite:
    """Min-(depth, mults) composite sign via shortest path over band states.

    States are log2 of the current band half-width, discretized to `grid`
    (errors are pinned pessimistically to the grid, so the found schedule
    is feasible); edges are single odd minimax stages with measured
    (depth, mults) costs on this evaluator. Equivalent in role to the
    reference's upgrade_oddbaby DP (comp/program.cpp:3-60), which minimizes
    mults for given depth over its own evaluation trees.
    """
    import heapq
    import math

    name = (f"sign_dp_t{target_err:.3e}_e{eps:.3e}_"
            f"d{'_'.join(map(str, degrees))}")
    path = _cache_path(name)
    if use_cache and os.path.exists(path):
        return _load_stages(path)

    costs = {d: stage_cost(d) for d in degrees}
    tgt = math.log2(target_err)
    start = math.log2(eps)

    def snap(t: float) -> float:
        # Discretize in log2(−log2 e): uniform resolution from bands
        # hugging e≈1 (early stages) down to 2^-40 tails. Pessimistic
        # (rounds toward larger e), so found schedules stay feasible.
        s = math.floor(math.log2(-t) / grid) * grid
        return -(2.0 ** s)

    # Dijkstra on (depth, mults) lexicographic cost.
    pq = [((0, 0), start, ())]
    best = {}
    sched = None
    while pq:
        (dep, mu), state, via = heapq.heappop(pq)
        if state <= tgt:
            sched = via
            break
        if best.get(state, (1 << 30, 0)) <= (dep, mu):
            continue
        best[state] = (dep, mu)
        for d in degrees:
            e2 = _stage_err_table(d, state, first=not via,
                                  prec_dps=prec_dps)
            # Band stages must shrink the band (the first stage maps the
            # gap parameter to a band — different quantity, always taken).
            if via and e2 >= state - 1e-9:
                continue
            sdep, smu = costs[d]
            nxt = tgt if e2 <= tgt else snap(e2)
            heapq.heappush(pq, ((dep + sdep, mu + smu), nxt, via + (d,)))
    assert sched, "dp_schedule: no feasible composition found"

    # Realize the schedule with exact sequential Remez (true errors).
    a, b = mpf(eps), mpf(1)
    stages = []
    err = mpf(1)
    for d in sched:
        p, err = _sign_stage(a, b, d, prec_dps)
        stages.append(p)
        a, b = 1 - err, 1 + err
    out = SignComposite(stages=stages, eps=eps, err=float(err))
    _save_stages(path, stages, eps, float(err))
    return out


def relu(sc: SignComposite, x: np.ndarray) -> np.ndarray:
    """ReLU via composite sign (simulator): x·(1+sgn(x))/2."""
    return x * (1.0 + sc(x)) / 2.0


def approx_max(sc: SignComposite, a, b, bound: float = 1.0):
    """max(a,b) = ((a+b) + (a-b)·sgn((a-b)/bound)) / 2 (Fold.cpp:95 model)."""
    d = (a - b) / bound
    return 0.5 * ((a + b) + (a - b) * sc(d))


# ---------------------------------------------------------------------------
# GELU piecewise approximation (PolyApprox.cpp:336-504 semantics, coefficients
# regenerated by Remez instead of hardcoded).
# Window breakpoints (-4, -1.95, 3): below -4 -> 0; [-4,-1.95] -> p(x);
# [-1.95, 3] -> q(x); above 3 -> x.
# ---------------------------------------------------------------------------

GELU_BREAKS = (-4.0, -1.95, 3.0)


def _gelu_mp(x):
    return x / 2 * (1 + erf(x / sqrt(2)))


@dataclass
class GeluApprox:
    p: ChebPoly           # on [-4, -1.95]
    q: ChebPoly           # on [-1.95, 3]
    err_p: float
    err_q: float


def gelu_approx(deg_p: int = 4, deg_q: int = 7, prec_dps: int = 60,
                in_bound: float = 16.0, use_cache: bool = True) -> GeluApprox:
    """Segment fits expressed over the full input range [-in_bound, in_bound]
    so window-masked evaluation never extrapolates the basis."""
    name = f"gelu_p{deg_p}_q{deg_q}_b{in_bound:g}"
    path = _cache_path(name)
    hull = (-in_bound, in_bound)
    if use_cache and os.path.exists(path):
        with open(path) as f:
            d = json.load(f)
        return GeluApprox(
            p=ChebPoly([mpf(c) for c in d["p"]], mpf(hull[0]), mpf(hull[1])),
            q=ChebPoly([mpf(c) for c in d["q"]], mpf(hull[0]), mpf(hull[1])),
            err_p=d["err_p"], err_q=d["err_q"],
        )
    p, ep = remez(_gelu_mp, [(GELU_BREAKS[0], GELU_BREAKS[1])], deg_p,
                  prec_dps=prec_dps, hull=hull)
    q, eq = remez(_gelu_mp, [(GELU_BREAKS[1], GELU_BREAKS[2])], deg_q,
                  prec_dps=prec_dps, hull=hull)
    out = GeluApprox(p=p, q=q, err_p=float(ep), err_q=float(eq))
    with open(path, "w") as f:
        json.dump({"p": [float(c) for c in p.coeffs],
                   "q": [float(c) for c in q.coeffs],
                   "err_p": out.err_p, "err_q": out.err_q}, f)
    return out


def gelu_even_approx(bound: float = 8.0, degree: int = 46) -> "ChebPoly":
    """Direct GELU fit via the identity gelu(x) = x/2 + h(x) with
    h(x) = (x/2)·erf(x/√2) EVEN and entire: a single Chebyshev interpolant of
    h on [-bound, bound] (half the nonzero terms, no windows, no sign
    composites). Errors: ~1e-8 at (bound 8, deg 46); ~4e-5 at (16, 62).

    This is the framework's default GELU path — cheaper and more accurate
    than the reference's piecewise sign-windowed construction
    (PolyApprox.cpp:336-504), which remains available in nn/kernels.py."""
    import math
    from .remez import cheb_interp
    erf_v = np.vectorize(math.erf)
    return cheb_interp(lambda x: x / 2 * erf_v(x / np.sqrt(2)),
                       -bound, bound, degree)


def gelu_float(x: np.ndarray) -> np.ndarray:
    """Exact GELU in numpy (erf-based oracle)."""
    import math
    erf_v = np.vectorize(math.erf)
    return x / 2.0 * (1.0 + erf_v(x / math.sqrt(2.0)))
