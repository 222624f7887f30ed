"""Full CKKS bootstrapping: ModRaise → SubSum → CoeffToSlot → EvalMod →
SlotToCoeff.

Counterpart of the reference's Bootstrapper/ModularReducer
(ckks_bootstrapping/Bootstrapper.cpp:2906-3455, ModularReducer.cpp) rebuilt
on this framework's primitives:

  * CtS/StC are the factorized special-FFT LT specs (boot/fft.py) applied
    with the generic BSGS LT engine — the counterpart of the reference's
    2/3-factor sfl matrices and bsgs_linear_transform loops.
  * EvalMod is a Remez minimax cosine (multi-interval around the integers,
    like RemezCos) evaluated with the depth-log Chebyshev planner, followed
    by double-angle iterations and an arcsin correction polynomial.
  * Sparse slots (the reference's bootstrap_sparse_*) come from SubSum +
    subring-sized FFT factors tiled across the replicated slot groups.

Scale bookkeeping follows the reference's trick (Bootstrapper.cpp:3092):
after ModRaise the ciphertext scale is *relabeled* q0, so slot values are
x = (Δ/q0)·m + I; EvalMod computes sin(2πx)/(2π) ≈ (Δ/q0)·m and the output
is relabeled Δ — no extra multiplications.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from mpmath import mp, mpf, cos, pi as mp_pi, asin as mp_asin

from ..approx.chebeval import make_plan, eval_plan
from ..approx.remez import remez, to_float_coeffs
from ..core import ntt as nttmod
from ..core.evaluator import Ciphertext
from ..core.modmath import barrett_reduce, sub_mod
from ..nn.linear import LTSpec, apply_lt
from . import fft


# ---------------------------------------------------------------------------
# ModRaise (Bootstrapper.cpp:2906-2960 semantics)
# ---------------------------------------------------------------------------

@jax.jit
def _mod_raise_core(x, t_q0, t_full, q0_img, q0_half):
    """x: uint64[k, 1, N] NTT form mod q0 -> uint64[k, L, N] NTT form.

    Centered lift: v in [0,q0) maps to v (if v <= q0/2) else v - q0, reduced
    into each target modulus.
    """
    coeff = nttmod._intt(x, t_q0)[..., 0, :]          # [k, N] mod q0
    big = coeff > q0_half
    r = barrett_reduce(coeff[..., None, :], t_full.q, t_full.ratio1)
    r = jnp.where(big[..., None, :], sub_mod(r, q0_img, t_full.q), r)
    return nttmod._ntt(r, t_full)


@jax.jit
def _mod_raise_core2(x, t_base, t_full, q0_img, consts):
    """Composite-base ModRaise: x uint32[k, 2, N] NTT form mod (q0a, q0b)
    -> uint32[k, L, N] NTT form mod the full chain.

    Garner CRT-combine the two base limbs into X < Q0 = q0a·q0b (< 2**62,
    uint64 intermediate — one small step, everything else stays 32-bit),
    centered-lift, and reduce into each target modulus with 64-bit Barrett
    tables (q64/ratio64 precomputed host-side)."""
    from ..core.modmath import mul_mod_shoup
    (q0a, q0b, inv_a, inv_a_sh, x0b_r1, q0_half, q64, r64) = consts
    coeff = nttmod._intt(x, t_base)                    # [k, 2, N] u32
    x0 = coeff[..., 0, :]
    x1 = coeff[..., 1, :]
    x0b = barrett_reduce(x0, q0b, x0b_r1)              # x0 mod q0b
    t = mul_mod_shoup(sub_mod(x1, x0b, q0b), inv_a, inv_a_sh, q0b)
    X = x0.astype(jnp.uint64) + jnp.uint64(q0a) * t.astype(jnp.uint64)
    big = X > q0_half                                  # centered lift test
    r = barrett_reduce(X[..., None, :], q64, r64).astype(x.dtype)
    r = jnp.where(big[..., None, :], sub_mod(r, q0_img, t_full.q), r)
    return nttmod._ntt(r, t_full)


# ---------------------------------------------------------------------------
# EvalMod polynomial generation (ModularReducer semantics)
# ---------------------------------------------------------------------------

@dataclass
class EvalModPoly:
    cos_plan: object          # Chebyshev plan for cos(2π(x-0.25)/sf) on ±K·[..]
    num_double: int
    arcsin_plan: object | None
    K: int
    eps: float
    arcsin_coeffs: object = None   # raw coeffs (for amplitude re-scaling)
    amp: float = 1.0               # folded output amplitude (q0/Δ)

    def with_amplitude(self, amp: float) -> "EvalModPoly":
        """Fold an output amplitude into the final correction polynomial —
        how the (Δ/q0) value ratio is undone without extra multiplies."""
        from dataclasses import replace as _rep
        ap = None
        if self.arcsin_coeffs is not None:
            c, lo, hi = self.arcsin_coeffs
            ap = make_plan(np.asarray(c) * amp, lo, hi)
        return _rep(self, arcsin_plan=ap, amp=amp)


def make_evalmod(K: int = 12, eps: float = 2 ** -8, degree: int = 30,
                 num_double: int = 2, arcsin_degree: int = 3,
                 prec_dps: int = 80, use_cache: bool = True) -> EvalModPoly:
    """Remez cosine over ∪_{i=-K..K} [i-eps, i+eps], then double-angle and
    arcsin correction (RemezCos/RemezArcsin + ModularReducer pipeline).

    Tables are disk-cached under approx/_cache — the counterpart of the
    reference's checked-in cosine.txt/inverse_sine.txt heaps
    (ModularReducer::write_polynomials, ModularReducer.cpp:53-59)."""
    import json
    import os
    sf = 1 << num_double
    cache = os.path.join(os.path.dirname(__file__), "..", "approx", "_cache",
                         f"evalmod_K{K}_e{eps:.3e}_d{degree}_nd{num_double}"
                         f"_a{arcsin_degree}_p{prec_dps}.json")
    if use_cache and os.path.exists(cache):
        with open(cache) as f:
            d = json.load(f)
        cos_plan = make_plan(np.array(d["cos"]), d["cos_lo"], d["cos_hi"])
        arcsin_coeffs = None
        arcsin_plan = None
        if d.get("arcsin"):
            arcsin_coeffs = (np.array(d["arcsin"]), d["as_lo"], d["as_hi"])
            arcsin_plan = make_plan(*arcsin_coeffs)
        return EvalModPoly(cos_plan=cos_plan, num_double=num_double,
                           arcsin_plan=arcsin_plan, K=K, eps=eps,
                           arcsin_coeffs=arcsin_coeffs)
    intervals = [(mpf(i) - eps, mpf(i) + eps) for i in range(-K, K + 1)]

    def target(x):
        return cos(2 * mp_pi * (x - mpf("0.25")) / sf)

    def target_np(x):
        return np.cos(2 * np.pi * (np.asarray(x) - 0.25) / sf)

    poly, err = remez(target, intervals, degree, prec_dps=prec_dps,
                      scan=400, func_np=target_np)
    cos_plan = make_plan(to_float_coeffs(poly), float(poly.lo), float(poly.hi))
    arcsin_plan = None
    if arcsin_degree > 1:
        # Odd correction poly asin(t)/(2π): the argument is sin(2πf) with
        # |f| <= eps, so fit only the tiny range |t| <= ~2π·eps.
        bound = min(0.99, 2 * math.pi * eps * 1.5)
        ap, _ = remez(lambda t: mp_asin(t) / (2 * mp_pi),
                      [(mpf(bound) / 1000, mpf(bound))], arcsin_degree,
                      odd=True, prec_dps=prec_dps, scan=600,
                      func_np=lambda t: np.arcsin(np.asarray(t)) / (2 * np.pi))
        arcsin_plan = make_plan(to_float_coeffs(ap), float(ap.lo), float(ap.hi))
        arcsin_coeffs = (to_float_coeffs(ap), float(ap.lo), float(ap.hi))
    else:
        arcsin_coeffs = None
    if use_cache:
        d = {"cos": [float(c) for c in to_float_coeffs(poly)],
             "cos_lo": float(poly.lo), "cos_hi": float(poly.hi),
             "err": float(err)}
        if arcsin_coeffs is not None:
            d["arcsin"] = [float(c) for c in arcsin_coeffs[0]]
            d["as_lo"], d["as_hi"] = arcsin_coeffs[1], arcsin_coeffs[2]
        with open(cache, "w") as f:
            json.dump(d, f)
    return EvalModPoly(cos_plan=cos_plan, num_double=num_double,
                       arcsin_plan=arcsin_plan, K=K, eps=eps,
                       arcsin_coeffs=arcsin_coeffs)


def eval_mod(B, x, em: EvalModPoly):
    """y ≈ frac_centered(x) = x - round(x), for x within ±(K+eps) of integers.

    cos(2π(x-0.25)/sf) --double-angle--> cos(2πx - π/2) = sin(2πx),
    then asin(·)/(2π) (or linear 1/(2π)) gives the centered fraction.
    """
    # Map x into the cos argument domain: the plan's domain is [-K-1, K+1].
    y = eval_plan(B, em.cos_plan, x)
    for _ in range(em.num_double):
        y = B.add_const(B.mul_const(B.square(y), 2.0), -1.0)
    if em.arcsin_plan is not None:
        y = eval_plan(B, em.arcsin_plan, y)
    else:
        y = B.mul_const(y, em.amp / (2 * math.pi))
    return y


# ---------------------------------------------------------------------------
# Bootstrapper
# ---------------------------------------------------------------------------

class Bootstrapper:
    """Bootstraps level-exhausted ciphertexts back to `target_level`.

    Built over a CkksBackend (for LT/poly kernels) — construction
    precomputes FFT factor plans and the EvalMod polynomials.
    """

    def __init__(self, backend, num_slots: int | None = None,
                 target_level: int | None = None, cts_factors: int = 2,
                 stc_factors: int = 2, evalmod: EvalModPoly | None = None):
        B = backend
        ctx = B.ctx
        self.B = B
        self.ctx = ctx
        self.n = ctx.params.slots
        self.ns = num_slots or (ctx.params.sparse_slots or self.n)
        self.target_level = target_level or ctx.L
        em = evalmod or make_evalmod()
        # Fold Q0/Δ into the output amplitude (see scale bookkeeping note).
        # Q0 is the base-limb product (a single prime classically; a pair
        # under composite scaling).
        self.em = em.with_amplitude(ctx.q0_float / ctx.params.scale)
        two_n_sub = 4 * self.ns
        exp_sub = (ctx.exp_of_slot[: self.ns] % two_n_sub).astype(np.int64)
        rep = self.n // self.ns
        # Inverse factors (CoeffToSlot: slots -> scrambled coeffs) include
        # 1/2 per stage (total 1/(2·ns)·2 = ...); fold the SubSum replication
        # factor 1/rep into the first factor.
        inv = fft.build_fft_factors(self.ns, exp_sub, two_n_sub, inverse=True,
                                    num_factors=cts_factors,
                                    scale_all=1.0 / rep)
        fwd = fft.build_fft_factors(self.ns, exp_sub, two_n_sub, inverse=False,
                                    num_factors=stc_factors)
        self.cts_plans = [self._plan(f, "cts") for f in inv]
        self.stc_plans = [self._plan(f, "stc") for f in fwd]
        self.subsum_steps = [self.ns * (1 << i)
                             for i in range(int(math.log2(rep)))]

    def _plan(self, diag: dict, name: str):
        rep = self.n // self.ns
        tiled = {(int(r), 0, 0): np.tile(v, rep) for r, v in diag.items()}
        spec = LTSpec(slots=self.n, n_src=1, n_dst=1, diagonals=tiled,
                      name=name)
        return spec.bsgs_plan()

    def required_steps(self) -> list[int]:
        """Rotation steps needed (for Galois keygen) incl. conjugation flag."""
        steps = set(self.subsum_steps)
        for plan in self.cts_plans + self.stc_plans:
            steps.update(a for a in plan.baby_amounts if a)
            steps.update(jg for jg in plan.groups if jg)
        return sorted(steps)

    # -- pipeline -----------------------------------------------------------
    #
    # The pipeline is expressed as a list of stage functions (ct -> ct) over
    # a NORMALIZED entry point (level 1, scale exactly Δ). Two consumers:
    #   * bootstrap() composes them inline — used under an enclosing trace
    #     (auto-boot inside a jitted kernel) and on the plain bring-up path;
    #   * bootstrap_jitted() jits each stage once (jit_sealed: keys and
    #     masks as arguments) and reuses the ~8 small programs for every
    #     refresh in a model run. Whole-pipeline jit at production rings
    #     OOMs the compiler (observed >115 GB at logN=15); per-stage
    #     programs compile in minutes and amortize across all bootstraps.

    def stages(self) -> list:
        """[(name, fn)] with fn: list[Ciphertext] -> list[Ciphertext].
        Entry contract: one ct at level 1, scale exactly Δ. Exit: one ct at
        target level, scale exactly Δ (value preserved)."""
        B, ctx = self.B, self.ctx
        ev = B.ev
        from ..core.evaluator import stack_cts, unstack_cts

        def prep(cts):
            [ct] = cts
            Q0 = ctx.q0_int
            L = ctx.L
            t_full = ctx.tables(L)
            q0_img = jnp.asarray(ctx.const_residues(Q0, tuple(range(L))))
            if ctx.base_limbs == 1:
                t_q0 = ctx.tables((0,))
                raised = _mod_raise_core(
                    ct.data, t_q0, t_full, q0_img,
                    jnp.asarray(np.array(Q0 >> 1, dtype=ctx.word)))
            else:
                assert ctx.base_limbs == 2, "composite base is a pair"
                from ..core.modmath import shoup as _shoup, barrett_ratio
                q0a, q0b = ctx.moduli[0], ctx.moduli[1]
                inv_a = pow(q0a, -1, q0b)
                w = ctx.word_bits
                consts = (
                    np.array(q0a, dtype=np.uint64),
                    np.array(q0b, dtype=ctx.word),
                    np.array(inv_a, dtype=ctx.word),
                    np.array(_shoup(inv_a, q0b, w), dtype=ctx.word),
                    np.array(barrett_ratio(q0b, w)[1], dtype=ctx.word),
                    np.array(Q0 >> 1, dtype=np.uint64),
                    np.array([[q] for q in ctx.moduli[:L]], dtype=np.uint64),
                    np.array([[barrett_ratio(q, 64)[1]]
                              for q in ctx.moduli[:L]], dtype=np.uint64),
                )
                raised = _mod_raise_core2(ct.data, ctx.tables((0, 1)),
                                          t_full, q0_img, consts)
            ct = Ciphertext(raised, float(Q0))
            for s in self.subsum_steps:
                ct = ev.add(ct, ev.rotate(ct, s))
            return [ct]

        fns = [("prep", prep)]
        for i, p in enumerate(self.cts_plans):
            fns.append((f"cts{i}",
                        lambda cts, p=p: apply_lt(B, p, cts)))

        def split(cts):
            # Real/imag split, then STACK the two parts on the ciphertext
            # batch axis: EvalMod (the deepest stage) runs once, batched —
            # half the NTT work of evaluating re and im separately.
            [y] = cts
            yc = ev.conjugate(y)
            ct_re = B.mul_const(ev.add(y, yc), 0.5)
            ct_im = B.mul_const(self._mul_neg_i(ev.sub(y, yc)), 0.5)
            ct_re = ev.mod_switch_to(ct_re, ct_im.level)
            return [stack_cts([ct_re, ct_im])]

        fns.append(("split", split))
        fns.append(("evalmod", lambda cts: [eval_mod(B, cts[0], self.em)]))

        def recombine(cts):
            ct_re, ct_im = unstack_cts(cts[0])
            return [B.add(ct_re, self._mul_i(ct_im))]

        fns.append(("recombine", recombine))
        for i, p in enumerate(self.stc_plans):
            fns.append((f"stc{i}",
                        lambda cts, p=p: apply_lt(B, p, cts)))
        return fns

    def _normalize_entry(self, ct: Ciphertext) -> Ciphertext:
        """Mod-switch to the base level (1 limb classically, the base pair
        under composite scaling) and pin scale to exactly Δ so every stage
        sees ONE (shape, level, scale) signature — the staged programs then
        compile once per model run. Small label drift (≤1e-4, the exact-
        targeting floor) is absorbed by relabeling; larger drift is fixed
        with one exact targeted multiply while levels remain."""
        B, ev = self.B, self.B.ev
        ctx = self.ctx
        delta = ctx.params.scale
        ratio = ct.scale / delta
        if (abs(ratio - 1) > 1e-4
                and ct.level - ctx.rescale_limbs >= ctx.base_limbs):
            cs = delta * ctx.rescale_divisor(ct.level) / ct.scale
            ct = ev.rescale_to_scale(ev.mul_const(ct, 1.0, const_scale=cs),
                                     delta)
        if ct.level > ctx.base_limbs:
            ct = ev.mod_switch_to(ct, ctx.base_limbs)
        from dataclasses import replace
        return replace(ct, scale=delta)

    def bootstrap(self, ct: Ciphertext, **kw) -> Ciphertext:
        assert ct.k == 2
        delta = ct.scale
        ct = self._normalize_entry(ct)
        xs = [ct]
        for _, fn in self.stages():
            xs = fn(xs)
        [out] = xs
        # Output values are already m at the context scale (amplitude folded
        # into the arcsin stage); relabel to the incoming scale exactly.
        from dataclasses import replace
        return replace(out, scale=delta)

    def bootstrap_jitted(self, ct: Ciphertext) -> Ciphertext:
        """Staged-jit bootstrap for concrete (non-traced) ciphertexts: each
        stage is its own jit_sealed program, compiled on first use and
        cached on this Bootstrapper."""
        assert ct.k == 2
        delta = ct.scale
        ct = self._normalize_entry(ct)
        jfs = getattr(self, "_staged_jit", None)
        if jfs is None:
            import os
            import sys
            import time

            import jax

            from ..nn.backend import jit_sealed
            verbose = os.environ.get("FHE_BOOT_VERBOSE", "").lower() in (
                "1", "true", "yes")
            jfs = []
            xs = [ct]
            for name, fn in self.stages():
                t0 = time.time()
                jf = jit_sealed(self.B, fn, xs)
                jfs.append(jf)
                xs = jax.block_until_ready(jf(xs)) if verbose else jf(xs)
                if verbose:
                    print(f"# boot stage {name}: compile+run "
                          f"{time.time()-t0:.1f}s", file=sys.stderr)
            self._staged_jit = jfs
            out = xs
        else:
            xs = [ct]
            for jf in jfs:
                xs = jf(xs)
            out = xs
        from dataclasses import replace
        return replace(out[0], scale=delta)

    def _apply(self, plans, xs):
        for p in plans:
            xs = apply_lt(self.B, p, xs)
        return xs

    def _mul_i(self, ct):
        """Multiply slots by i (plaintext constant vector of i)."""
        return self.B.mul_plain(ct, self._i_vec)

    def _mul_neg_i(self, ct):
        return self.B.mul_plain(ct, self._neg_i_vec)

    @property
    def _i_vec(self):
        v = getattr(self, "_iv", None)
        if v is None:
            v = np.full(self.n, 1j)
            self._iv = v
        return v

    @property
    def _neg_i_vec(self):
        v = getattr(self, "_niv", None)
        if v is None:
            v = np.full(self.n, -1j)
            self._niv = v
        return v
