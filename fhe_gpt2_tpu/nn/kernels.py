"""Backend-generic encrypted NN kernels: folds, sign/ReLU/GELU, iterative
approximations (exp, inverse, rsqrt).

Semantics follow the reference kernel layer (Fold.cpp, PolyApprox.cpp,
IterApprox.cpp; Python specs plain_approx/{fold,poly,iterations}.py) but each
kernel is written once against the backend protocol (nn/backend.py) and runs
on the plaintext simulator or on ciphertexts. Polynomials evaluate in the
Chebyshev basis with BSGS plans (approx/chebeval.py) instead of the
reference's Horner/power-basis loops, keeping multiplicative depth
logarithmic in the degree.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..approx.chebeval import make_plan, eval_plan
from ..approx.minimax import GeluApprox, SignComposite, gelu_approx


# ---------------------------------------------------------------------------
# Folds (log-rotation reductions; Fold.cpp:20-102 semantics)
# ---------------------------------------------------------------------------

def fold_sum(B, x, n: int):
    """x'[t] = Σ_{j<n} x[t+j] (n a power of two; log2 n rotations)."""
    k = n.bit_length() - 1
    assert 1 << k == n
    for i in range(k):
        x = B.add(x, B.rotate(x, 1 << i))
    return x


def fold_max(B, x, n: int, sign: "SignPlans", bound: float = 1.0):
    """x'[t] = max_{j<n} x[t+j] via the approx-max tree (quickMax)."""
    k = n.bit_length() - 1
    for i in range(k):
        x = approx_max(B, x, B.rotate(x, 1 << i), sign, bound)
    return x


def replicate(B, x, width: int, copies: int):
    """Duplicate a width-long block to `copies` adjacent blocks:
    x'[t] = Σ_{j<copies} x[t - j·width] (the reference's duplicate trick)."""
    k = copies.bit_length() - 1
    assert 1 << k == copies
    for i in range(k):
        x = B.add(x, B.rotate(x, -(width << i)))
    return x


# ---------------------------------------------------------------------------
# Sign / ReLU / max (composite minimax; PolyApprox.cpp:103-334, SEALcomp.cpp)
# ---------------------------------------------------------------------------

@dataclass
class SignPlans:
    """Device-ready evaluation plans for a SignComposite."""

    plans: list
    err: float

    @staticmethod
    def from_composite(sc: SignComposite) -> "SignPlans":
        plans = [
            make_plan(np.array([float(v) for v in p.coeffs]),
                      float(p.lo), float(p.hi))
            for p in sc.stages
        ]
        return SignPlans(plans=plans, err=sc.err)


def sign(B, x, sp: SignPlans):
    """sgn(x) for |x| ∈ [eps, 1]."""
    for plan in sp.plans:
        x = eval_plan(B, plan, x)
    return x


def sign_depth(sp: SignPlans) -> int:
    """Multiplicative depth of the composite sign as this engine evaluates
    it (measured by running the plans on the cost backend, not estimated) —
    used to place bootstraps ahead of ReLUs instead of magic level numbers."""
    from ..approx.minimax import _CostBackend
    d = 0
    for plan in sp.plans:
        d += eval_plan(_CostBackend(), plan, 0)
    return int(d)


def relu(B, x, sp: SignPlans, bound: float = 1.0):
    """ReLU(x) for |x| ≤ bound: x·(1+sgn(x/bound))/2 (minimax_ReLU_seal)."""
    s = sign(B, B.mul_const(x, 1.0 / bound), sp)
    half = B.add_const(B.mul_const(s, 0.5), 0.5)
    return B.mul(x, half)


def approx_max(B, a, b, sp: SignPlans, bound: float = 1.0):
    """max(a,b) = ½((a+b) + (a−b)·sgn((a−b)/bound)) (Fold.cpp computeMax)."""
    diff = B.sub(a, b)
    s = sign(B, B.mul_const(diff, 1.0 / bound), sp)
    return B.mul_const(B.add(B.add(a, b), B.mul(diff, s)), 0.5)


# ---------------------------------------------------------------------------
# GELU (piecewise windows via shifted signs; PolyApprox.cpp:336-504)
# ---------------------------------------------------------------------------

@dataclass
class GeluPlans:
    p_plan: object
    q_plan: object
    breaks: tuple
    sign: SignPlans
    in_bound: float      # inputs assumed within [-in_bound, in_bound]

    @staticmethod
    def make(sp: SignPlans, ga: GeluApprox | None = None,
             in_bound: float = 16.0) -> "GeluPlans":
        ga = ga or gelu_approx(in_bound=in_bound)
        from ..approx.minimax import GELU_BREAKS
        return GeluPlans(
            p_plan=make_plan([float(c) for c in ga.p.coeffs],
                             float(ga.p.lo), float(ga.p.hi)),
            q_plan=make_plan([float(c) for c in ga.q.coeffs],
                             float(ga.q.lo), float(ga.q.hi)),
            breaks=GELU_BREAKS, sign=sp, in_bound=in_bound)


@lru_cache(maxsize=None)
def gelu_even_plan(bound: float = 8.0, degree: int = 46):
    from ..approx.minimax import gelu_even_approx
    p = gelu_even_approx(bound, degree)
    return make_plan(np.array([float(c) for c in p.coeffs]),
                     float(p.lo), float(p.hi))


def gelu(B, x, bound: float = 8.0, degree: int = 46):
    """Default GELU: x/2 + h(x) with h even (gelu_even_approx). One poly
    evaluation, ~deg/4 ct-mults, no sign composites."""
    h = eval_plan(B, gelu_even_plan(bound, degree), x)
    return B.add(h, B.mul_const(x, 0.5))


def gelu_windows(B, x, gp: GeluPlans):
    """Reference-style piecewise GELU: window masks from three shifted sign
    evaluations (PolyApprox.cpp:336-504).

    x < -4 → 0; [-4,-1.95] → p(x); [-1.95,3] → q(x); x > 3 → x.
    Caveat: window leakage multiplies the sign error by the (unconstrained)
    p/q values outside their segments; prefer `gelu` unless reproducing the
    reference's behavior.
    """
    b0, b1, b2 = gp.breaks
    inv = 1.0 / gp.in_bound
    s0 = sign(B, B.mul_const(B.add_const(x, -b0), inv), gp.sign)
    s1 = sign(B, B.mul_const(B.add_const(x, -b1), inv), gp.sign)
    s2 = sign(B, B.mul_const(B.add_const(x, -b2), inv), gp.sign)
    # Window weights: w_p = (s0 − s1)/2, w_q = (s1 − s2)/2, w_x = (1 + s2)/2.
    wp = B.mul_const(B.sub(s0, s1), 0.5)
    wq = B.mul_const(B.sub(s1, s2), 0.5)
    wx = B.add_const(B.mul_const(s2, 0.5), 0.5)
    px = eval_plan(B, gp.p_plan, x)
    qx = eval_plan(B, gp.q_plan, x)
    out = B.add(B.mul(wp, px), B.mul(wq, qx))
    return B.add(out, B.mul(wx, x))


# ---------------------------------------------------------------------------
# Iterative approximations (IterApprox.cpp; plain_approx/iterations.py)
# ---------------------------------------------------------------------------

def exp(B, x, r: int = 6):
    """exp(x) ≈ (1 + x/2^r)^(2^r) by r squarings (compute_exp)."""
    y = B.add_const(B.mul_const(x, 1.0 / (1 << r)), 1.0)
    for _ in range(r):
        y = B.square(y)
    return y


def goldschmidt_inverse(B, num, den, iters: int = 9):
    """num/den for den ∈ (0, 2) (compute_inverse core)."""
    n, d = num, den
    for _ in range(iters):
        f = B.add_const(B.neg(d), 2.0)
        n = B.mul(n, f)
        d = B.mul(d, f)
    return n


def inverse(B, x, iters: int = 9, prescale: float = 1e-3):
    """1/x with the reference's 0.001 pre-normalization (IterApprox.cpp:15)."""
    num = B.mul_const(x, 0.0)  # zeros — replaced below
    # n = prescale/ x·prescale ... follow reference: n=prescale_const, d=x·prescale
    d = B.mul_const(x, prescale)
    # numerator starts at prescale (constant): build from x·0 + prescale
    num = B.add_const(num, prescale)
    return goldschmidt_inverse(B, num, d, iters)


def taylor_rsqrt_seed(B, x, a: float):
    """Order-3 Taylor of 1/sqrt(x−1+...) around x=a — matches the
    reference's taylor_expand (IterApprox.cpp:69, iterations.py:5):
    seed = (a−1)^(−1/2) + Σ_k c_k (a−1)^(−1/2−k) (x−a)^k / k!."""
    am1 = a - 1.0
    c = [
        am1 ** -0.5,
        -0.5 * am1 ** -1.5,
        (0.75 / 2.0) * am1 ** -2.5,
        (-1.875 / 6.0) * am1 ** -3.5,
    ]
    dx = B.add_const(x, -a)
    out = B.add_const(B.mul_const(dx, c[1]), c[0])
    dx2 = B.square(dx)
    out = B.add(out, B.mul_const(dx2, c[2]))
    out = B.add(out, B.mul_const(B.mul(dx2, dx), c[3]))
    return out


def newton_rsqrt(B, x, init: float, iters: int = 13):
    """1/sqrt(x) by Newton y ← y(1.5 − 0.5·x·y²), Taylor-seeded at `init`
    (compute_inv_sqrt / newton_iteration)."""
    y = taylor_rsqrt_seed(B, x, init)
    for _ in range(iters):
        y2 = B.square(y)
        t = B.add_const(B.mul_const(B.mul(x, y2), -0.5), 1.5)
        y = B.mul(y, t)
    return y
