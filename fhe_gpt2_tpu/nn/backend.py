"""Dual-backend slot-vector abstraction for the encrypted NN kernel library.

The reference maintains every kernel twice — C++ on SEAL ciphertexts
(gpt2_ckks/.../gpt2/*.cpp) and a NumPy simulator (plain_approx/*.py). Here
kernels are written once against this small backend protocol and run on:

  * PlainBackend — numpy float64 arrays shaped [batch, slots]; rotations are
    np.roll. The correctness oracle and the fast path for format/algorithm
    tests (plain_approx parity).
  * CkksBackend — batched Ciphertexts ([k, B, l, N]); rotations are Galois
    key switches, masks are plaintext multiplies, bootstrap is real (or the
    fake decrypt/re-encrypt during bring-up).

A "value" is whatever the backend returns; kernels must treat it opaquely.
All mask/plaintext operands are numpy arrays (host-side constants) — the
CkksBackend encodes them on demand and caches by (array identity, level,
scale).
"""

from __future__ import annotations

from dataclasses import dataclass, replace, field
from typing import Optional

import numpy as np

from ..core.context import CkksContext
from ..core.evaluator import (
    Ciphertext, Decryptor, Encryptor, Evaluator, Plaintext,
)


class PlainBackend:
    """Numpy float64 simulator. Values: np.ndarray [..., slots]."""

    def __init__(self, slots: int):
        self.slots = slots

    # -- arithmetic ---------------------------------------------------------
    def add(self, a, b):
        return a + b

    def sub(self, a, b):
        return a - b

    def neg(self, a):
        return -a

    def mul(self, a, b):
        return a * b

    def square(self, a):
        return a * a

    def mul_plain(self, a, v, out_scale=None):
        return a * v

    def add_plain(self, a, v):
        return a + v

    def add_const(self, a, c):
        return a + c

    def mul_const(self, a, c, out_scale=None):
        return a * c

    def scale_of(self, a):
        """Exact tracked scale of a value; None on the plain backend (scale
        targeting is a no-op there)."""
        return None

    def rotate(self, a, steps: int):
        return np.roll(a, -steps, axis=-1)

    def rotate_many(self, a, steps):
        return [self.rotate(a, s) for s in steps]

    def mul_plain_many_sum(self, values: list, masks: list):
        """Σ_t values[t] ⊙ masks[t] (fused masked accumulation)."""
        acc = values[0] * masks[0]
        for v, m in zip(values[1:], masks[1:]):
            acc = acc + v * m
        return acc

    def conjugate(self, a):
        return np.conj(a) if np.iscomplexobj(a) else a

    # -- batch-axis ops (values may carry leading batch dims; every
    #    arithmetic op above broadcasts over them) ---------------------------
    def stack(self, values: list):
        """Stack same-shape values along a NEW leading batch axis."""
        return np.stack(values)

    def unstack(self, a) -> list:
        return [a[i] for i in range(a.shape[0])]

    def take_batch(self, a, idx: tuple):
        """Advanced-index the leading batch axes (gather)."""
        return a[idx]

    def reduce_sum_batch(self, a, axis: int = 0):
        """Sum over one batch axis (additions only — no level/scale cost)."""
        return a.sum(axis=axis)

    # -- level management (no-ops in plaintext) -----------------------------
    def level(self, a) -> int:
        return 1 << 30

    def rescale(self, a):
        return a

    def bootstrap(self, a, **kw):
        return a

    def maybe_bootstrap(self, a, need_levels: int):
        return a

    # -- I/O ----------------------------------------------------------------
    def from_slots(self, arr: np.ndarray):
        return np.asarray(arr, dtype=np.float64)

    def to_slots(self, a) -> np.ndarray:
        return np.asarray(a)


class RecordingBackend(PlainBackend):
    """PlainBackend that records every rotation amount used.

    Run any kernel/model once on host data to infer the exact Galois key set
    it needs — the declarative replacement for the reference's hand-written
    rotation-key lists (util.h:60-69, infer_seal.cpp:345-360) and its
    surefire_rotate on-demand keygen hack (util.cpp:344)."""

    def __init__(self, slots: int):
        super().__init__(slots)
        self.steps: set[int] = set()

    def rotate(self, a, steps: int):
        self.steps.add(steps % self.slots)
        return super().rotate(a, steps)

    def key_steps(self) -> list[int]:
        return sorted(s for s in self.steps if s)


@dataclass
class _ExtValue:
    """A rotated ciphertext held in the extended QP basis (double-hoisting
    intermediate): data uint64[2, ..., l+k, N] = P·(rotated ct)."""

    data: object
    scale: float
    level: int


@dataclass
class CkksBackend:
    """Encrypted backend over the evaluator; values are Ciphertexts.

    Scale discipline: every value is kept at the context scale; mul/mul_plain
    rescale immediately (reduced-error relabeling), matching the reference's
    kernels which interleave rescales manually.
    """

    ctx: CkksContext
    ev: Evaluator
    enc: Optional[Encryptor] = None
    dec: Optional[Decryptor] = None          # only for fake bootstrap / debug
    boot: Optional[object] = None            # boot.Bootstrapper once built
    default_level: int = 0
    min_level_headroom: int = 3
    _plain_cache: dict = field(default_factory=dict)
    _keepalive: dict = field(default_factory=dict)
    # Bound on id()-keyed cache entries (eager paths only; seq-keyed jit
    # caches are exempt). ndarrays aren't weakref-able, so stale-id safety
    # pins the source array per entry — an LRU cap keeps a long-lived
    # process (e.g. the gRPC server) from growing that pin set without
    # bound; evicted masks are simply re-encoded on next use.
    max_id_cache: int = 4096
    # Disable the double-hoisted (extended QP basis) LT path: it is the
    # fastest route but traces the largest programs — at u64/logN=16 a CtS
    # stage overflows the remote XLA compile helper. The single-hoisted
    # fallback compiles in pieces a fraction of the size.
    no_ext_hoist: bool = False
    # Sequential cache-key mode (see jit_sealed): when a counter is set,
    # plaintext cache keys are ("q", seq, level, scale) instead of id(v) —
    # structurally identical kernels (e.g. two ResNet blocks of the same
    # stage) then produce pytree-identical caches and share ONE compiled
    # program, with their different mask encodings riding as arguments.
    _seq: Optional[list] = None

    @property
    def slots(self) -> int:
        return self.ctx.params.slots

    # -- plaintext encoding cache ------------------------------------------
    def _pin(self, key, v) -> None:
        """Pin an id()-keyed cache source and LRU-evict beyond the cap
        (entry + pin together, so a recycled id can never alias)."""
        self._keepalive[key] = v
        while len(self._keepalive) > self.max_id_cache:
            old = next(iter(self._keepalive))
            del self._keepalive[old]
            self._plain_cache.pop(old, None)

    def _plain(self, v: np.ndarray, level: int, scale: float) -> Plaintext:
        # Keys must be homogeneous tuples ("q"/"ext" tag first): the cache is
        # passed as a jit-argument pytree (jit_sealed) and pytree dicts sort
        # their keys.
        if self._seq is not None:
            self._seq[0] += 1
            key = ("q", self._seq[0], level, scale)
        else:
            key = ("q", id(v), level, scale)
        out = self._plain_cache.get(key)
        if out is None:
            # id()-keyed caching requires the source array to stay alive: a
            # freed mask's id can be recycled by a DIFFERENT array, silently
            # hitting the stale entry. Pin every cached source host-side
            # (not in the cache dict itself — that pytree rides as a jit
            # argument and must stay device-array-only).
            if self._seq is None:
                self._pin(key, v)
            v = np.asarray(v)
            if v.ndim > 1 and v.shape[-1] == self.slots:
                # Batched mask [batch..., slots]: encode each row, stack the
                # NTT-form limbs into [batch..., l, N] — one Plaintext whose
                # batch dims broadcast against a batched ciphertext.
                import jax
                import jax.numpy as jnp
                rows = v.reshape(-1, self.slots)
                pts = [self.ev.make_plain(r, scale, level) for r in rows]
                # The stack must be concrete even when this cache miss
                # happens under a trace (jit_sealed's eval_shape warm pass):
                # an unshielded jnp.stack of concrete rows inside a trace
                # yields a tracer, which poisons the cache and leaks into
                # the later real trace (UnexpectedTracerError in the
                # Δ-batched attention path).
                with jax.ensure_compile_time_eval():
                    data = jnp.stack([p.data for p in pts]).reshape(
                        *v.shape[:-1], *pts[0].data.shape)
                out = Plaintext(data=data, scale=scale)
            else:
                out = self.ev.make_plain(v.ravel(), scale, level)
            self._plain_cache[key] = out
        return out

    # -- arithmetic ---------------------------------------------------------
    def _add_guard(self, a, b):
        """A reduced-error add with a non-integer scale ratio needs one
        corrective multiply (set_scale_exact) — refresh the operands first
        when at the level floor. Close or integer-ratio scales are free:
        no refresh, so additive-only pipelines (e.g. PIR answers) never
        trigger a bootstrap."""
        from ..core.evaluator import _scales_close
        if _scales_close(a.scale, b.scale):
            return a, b
        f = max(a.scale, b.scale) / min(a.scale, b.scale)
        if abs(f - round(f)) < 1e-6 * f:
            return a, b
        return self._ab(a), self._ab(b)

    def add(self, a, b):
        a, b = self._add_guard(a, b)
        return self.ev.add_reduced_error(a, b)

    def sub(self, a, b):
        a, b = self._add_guard(a, b)
        return self.ev.sub_reduced_error(a, b)

    def neg(self, a):
        return self.ev.negate(a)

    def _next_prime(self, a) -> float:
        """What the next rescale divides by (a prime, or a pair product
        under composite scaling)."""
        return self.ctx.rescale_divisor(a.level)

    @property
    def _floor(self) -> int:
        """Level floor below which multiplicative ops refresh first:
        min_level_headroom logical levels above the bootstrap base."""
        ctx = self.ctx
        return (ctx.base_limbs - 1
                + self.min_level_headroom * ctx.rescale_limbs)

    def _ab(self, a):
        """Auto-bootstrap when level headroom is exhausted — the TPU-native
        form of the reference's mid-kernel bootstraps (Fold.cpp:95-96,
        PolyApprox.cpp:570): any multiplicative op refreshes its operand
        first when the level is at the floor. Kernels never place bootstraps
        by hand. With no real Bootstrapper the fake decrypt/re-encrypt reset
        stands in — but only on concrete ciphertexts (it decrypts host-side,
        impossible under a jit trace; traced kernels must budget levels via
        maybe_bootstrap scheduling instead)."""
        if a.level > self._floor:
            return a
        if self.boot is not None:
            return self.bootstrap(a)
        if self.dec is not None and self.enc is not None:
            import jax
            if not isinstance(a.data, jax.core.Tracer):
                return self.bootstrap(a)
        return a

    def _ab_rot(self, a):
        """Level guard for LEVEL-FREE ops (rotations, stacking): refresh only
        under a real Bootstrapper — a rotation at the level floor is valid,
        so the fake decrypt/re-encrypt fallback must not fire (it would
        decrypt mid-pipeline in flows that never need levels, e.g. PIR)."""
        if self.boot is not None and a.level <= self._floor:
            return self.bootstrap(a)
        return a

    def mul(self, a, b):
        """ct×ct multiply + rescale with EXACT scale tracking: the result
        scale is a.scale·b.scale/q_last, never relabeled. Relabeling to the
        context scale (the round-1 convention) injects |q_last/Δ − 1| as
        multiplicative error per multiply — harmless at 46-bit scales
        (drift ~2^-34) but catastrophic on the uint32 engine, where 25-bit
        NTT primes sit up to ~2^-11 off Δ (measured: 4.4e-3 per multiply).
        Scale alignment instead happens for free at the next scale-targeted
        plain multiply, or via the reduced-error add's exact correction
        (Kim et al. CT-RSA'22 — the discipline the reference adopts)."""
        a, b = self._ab(a), self._ab(b)
        out = self.ev.multiply_reduced_error(a, b)
        return self.ev.rescale(out)

    def square(self, a):
        a = self._ab(a)
        return self.ev.rescale(self.ev.square(a))

    def mul_plain(self, a, v, out_scale: float = None):
        a = self._ab(a)
        # Scale-targeted encoding (the reference's encode-at-matching-scale
        # reduced-error ops, evaluator.h:1269): choose the plaintext scale so
        # the rescaled product lands EXACTLY at out_scale (default: context
        # scale) — works in both the Δ regime and the bootstrap q0 regime.
        delta = out_scale or self.ctx.params.scale
        cs = delta * self._next_prime(a) / a.scale
        p = self._plain(v, a.level, cs)
        out = self.ev.mul_plain(a, p)
        return self.ev.rescale_to_scale(out, delta)

    def add_plain(self, a, v):
        p = self._plain(v, a.level, a.scale)
        return self.ev.add_plain(a, p)

    def add_const(self, a, c):
        return self.ev.add_const(a, float(c))

    def mul_const(self, a, c, out_scale: float = None):
        c = float(c)
        if out_scale is None and c == int(c) and abs(c) < 2 ** 40:
            # Exact integer multiply: free (no level, no scale change).
            return self.ev.mul_const_int(a, int(c))
        a = self._ab(a)
        delta = out_scale or self.ctx.params.scale
        cs = delta * self._next_prime(a) / a.scale
        out = self.ev.mul_const(a, c, const_scale=cs)
        return self.ev.rescale_to_scale(out, delta)

    def scale_of(self, a) -> float:
        return a.scale

    def rotate(self, a, steps: int):
        return self.ev.rotate(self._ab_rot(a), steps)

    def rotate_many(self, a, steps):
        """Hoisted multi-rotation (one digit decomposition). The source is
        refreshed once (not per rotation) when the level floor is hit."""
        return self.ev.rotate_hoisted(self._ab_rot(a), list(steps))

    def mul_plain_many_sum(self, values: list, masks: list):
        """Σ_t values[t] ⊙ masks[t] as one batched dyadic multiply + modular
        reduction and a single rescale — the LT engine's inner MAC.

        Summing before the rescale also improves precision (one rounding
        instead of T)."""
        import jax.numpy as jnp
        from ..core.evaluator import Ciphertext, mod_sum
        a0 = values[0]
        lvl = min(v.level for v in values)
        delta = self.ctx.params.scale
        cs = delta * self.ctx.rescale_divisor(lvl) / a0.scale
        stacked = jnp.stack([v.data[..., :lvl, :] for v in values], axis=1)
        pts = jnp.stack(
            [self._plain(m, lvl, cs).data for m in masks])     # [T, l, N]
        # Broadcast across any ciphertext batch dims: [T, 1..., l, N].
        batch_ndim = stacked.ndim - 4
        if batch_ndim:
            pts = pts.reshape(pts.shape[0], *(1,) * batch_ndim, *pts.shape[1:])
        t = self.ctx.tables(lvl)
        from ..core.modmath import mul_mod
        prod = mul_mod(stacked, pts, t.q, t.ratio0, t.ratio1)  # [2, T, l, N]
        acc = mod_sum(prod, t.q, t.ratio1, axis=1)
        out = Ciphertext(acc, a0.scale * cs)
        return self.ev.rescale_to_scale(out, delta)

    def conjugate(self, a):
        return self.ev.conjugate(a)

    # -- batch-axis ops -----------------------------------------------------
    def stack(self, values: list):
        from ..core.evaluator import stack_cts
        vals = [self._ab_rot(v) for v in values]
        lvl = min(v.level for v in vals)
        return stack_cts([self.ev.mod_switch_to(v, lvl) for v in vals])

    def unstack(self, a) -> list:
        from ..core.evaluator import unstack_cts
        return unstack_cts(a)

    def take_batch(self, a, idx: tuple):
        """Gather over the batch axes (component axis 0 untouched)."""
        return Ciphertext(a.data[(slice(None),) + tuple(idx)], a.scale)

    def reduce_sum_batch(self, a, axis: int = 0):
        from ..core.evaluator import mod_sum
        t = self.ctx.tables(a.level)
        return Ciphertext(
            mod_sum(a.data, t.q, t.ratio1, axis=1 + axis), a.scale)

    # -- double-hoisted LT path (Bossuat et al.; see evaluator
    #    hoisted_rotations_ext). The LT engine uses these when present. ------

    def lt_hoist_ext(self, xs: list, needed: dict):
        """Baby-rotate each source in the extended QP basis.

        needed: {src_index: sorted rotation amounts}. Returns
        {(src, amount): _ExtValue}. Sources are aligned to a common level
        (and auto-bootstrapped at the floor) before decomposition; sources
        sharing the same amount set are stacked and decomposed as ONE batched
        ciphertext (one digit decomposition / NTT dispatch for all of them).
        """
        import jax.numpy as jnp
        from ..core.evaluator import stack_cts
        srcs = {s: self._ab_rot(xs[s]) for s in needed}
        lvl = min(v.level for v in srcs.values())
        by_amounts: dict = {}
        for src, amounts in needed.items():
            by_amounts.setdefault(tuple(amounts), []).append(src)
        out = {}
        for amounts, group in by_amounts.items():
            from ..core.evaluator import _scales_close
            cts = [self.ev.mod_switch_to(srcs[s], lvl) for s in group]
            uniform = (len({c.data.shape for c in cts}) == 1
                       and all(_scales_close(c.scale, cts[0].scale)
                               for c in cts))
            if len(group) == 1 or not uniform:
                for src, c in zip(group, cts):
                    exts = self.ev.hoisted_rotations_ext(c, list(amounts))
                    for i, e in zip(amounts, exts):
                        out[(src, i)] = _ExtValue(e, c.scale, lvl)
                continue
            stacked = stack_cts(cts)
            exts = self.ev.hoisted_rotations_ext(stacked, list(amounts))
            for i, e in zip(amounts, exts):
                for bi, src in enumerate(group):
                    out[(src, i)] = _ExtValue(e[:, bi], stacked.scale, lvl)
        return out

    def rotate_same_batched(self, values: list, steps: int):
        """Rotate several same-shape values by the SAME amount as one batched
        keyswitch (stack → rotate → unstack) — used for the giant step of the
        LT engine across destination accumulators."""
        from ..core.evaluator import stack_cts, unstack_cts, _scales_close
        if (len(values) == 1
                or len({v.data.shape for v in values}) != 1
                or not all(_scales_close(v.scale, values[0].scale)
                           for v in values)):
            return [self.rotate(v, steps) for v in values]
        return unstack_cts(self.rotate(stack_cts(values), steps))

    def lt_mask_sum_ext(self, exts: list, masks: list):
        """Σ_t masks[t] ⊙ exts[t] accumulated in the QP basis, then ONE
        mod-down + rescale — replaces per-rotation mod-downs (the NTT-heavy
        half of a key switch) with one per destination accumulator."""
        import jax.numpy as jnp
        from ..core.evaluator import mod_sum
        from ..core.modmath import mul_mod
        e0 = exts[0]
        lvl = e0.level
        assert all(e.level == lvl for e in exts)
        from ..core.evaluator import _scales_close
        assert all(_scales_close(e.scale, e0.scale) for e in exts), \
            "lt_mask_sum_ext: mixed ext scales would be mis-weighted"
        delta = self.ctx.params.scale
        cs = delta * self.ctx.rescale_divisor(lvl) / e0.scale
        pts = jnp.stack([self._plain_ext(m, lvl, cs).data for m in masks])
        stacked = jnp.stack([e.data for e in exts], axis=1)  # [2, T, ..., lk, N]
        batch_ndim = stacked.ndim - 4
        if batch_ndim:
            pts = pts.reshape(pts.shape[0], *(1,) * batch_ndim, *pts.shape[1:])
        kt = self.ctx.tables(self.ctx.key_limbs(lvl))
        prod = mul_mod(stacked, pts, kt.q, kt.ratio0, kt.ratio1)
        acc = mod_sum(prod, kt.q, kt.ratio1, axis=1)
        out = self.ev.mod_down_ext(acc, lvl, e0.scale * cs)
        return self.ev.rescale_to_scale(out, delta)

    def _plain_ext(self, v: np.ndarray, level: int, scale: float):
        if self._seq is not None:
            self._seq[0] += 1
            key = ("ext", self._seq[0], level, scale)
        else:
            key = ("ext", id(v), level, scale)
        out = self._plain_cache.get(key)
        if out is None:
            if self._seq is None:
                self._pin(key, v)
            out = self.ev.make_plain_ext(np.asarray(v).ravel(), scale, level)
            self._plain_cache[key] = out
        return out

    # -- level management ---------------------------------------------------
    def level(self, a) -> int:
        return a.level

    def rescale(self, a):
        return self.ev.rescale(a)

    def bootstrap(self, a, **kw):
        if self.boot is not None:
            # Entry normalization (level 1, scale exactly Δ) happens inside
            # the Bootstrapper. Concrete ciphertexts take the staged-jit
            # path (~8 small programs compiled once per run); inside an
            # enclosing trace (auto-boot in a jitted kernel) the pipeline
            # inlines into the caller's program.
            import jax
            if not isinstance(a.data, jax.core.Tracer):
                return self.boot.bootstrap_jitted(a)
            return self.boot.bootstrap(a, **kw)
        # Bring-up path: decrypt/re-encrypt, like the reference's
        # fakeBootstrap (util.cpp:266-275).
        from ..core.evaluator import fake_bootstrap
        assert self.dec is not None and self.enc is not None
        return fake_bootstrap(a, self.dec, self.enc, self.ev,
                              self.default_level or self.ctx.L)

    def maybe_bootstrap(self, a, need_levels: int):
        # need_levels counts LOGICAL levels (multiplicative depth); convert
        # to limbs for the comparison (rescale_limbs per mult, above the
        # bootstrap base).
        ctx = self.ctx
        limbs = need_levels * ctx.rescale_limbs + ctx.base_limbs
        if a.level <= limbs:
            return self.bootstrap(a)
        return a

    # -- I/O ----------------------------------------------------------------
    def from_slots(self, arr: np.ndarray, level: Optional[int] = None):
        level = level or self.default_level or self.ctx.L
        arr = np.asarray(arr, dtype=np.float64)
        if arr.ndim == 1:
            pt = self.ev.make_plain(arr, self.ctx.params.scale, level)
            return self.enc.encrypt(pt)
        from ..core.evaluator import stack_cts
        cts = [self.enc.encrypt(self.ev.make_plain(row, self.ctx.params.scale,
                                                   level))
               for row in arr]
        return stack_cts(cts)

    def to_slots(self, a) -> np.ndarray:
        assert self.dec is not None
        from ..core.evaluator import unstack_cts
        if a.batch:
            return np.stack([np.real(self.dec.decrypt(c))
                             for c in unstack_cts(a)])
        return np.real(self.dec.decrypt(a))


def rebind_sealed(call, fn_other, *example_args):
    """Re-target a seq-keyed jit_sealed program at another structurally
    identical function (e.g. the next ResNet block of the same stage, same
    rotation amounts, different weights): fn_other is TRACED host-side only
    (eval_shape — seconds) to populate a fresh mask cache under the same
    sequential keys, then the ALREADY-COMPILED program is invoked with that
    cache as its argument pytree. Zero additional XLA compiles."""
    import jax

    B, ev, jf = call._B, call._B.ev, call._jf
    saved_cache, saved_seq = B._plain_cache, B._seq
    B._plain_cache, B._seq = {}, [0]
    try:
        jax.eval_shape(fn_other, *example_args)
        cache = B._plain_cache
    finally:
        B._plain_cache, B._seq = saved_cache, saved_seq

    def call2(*args):
        return jf(ev.relin_key, ev.galois_keys, cache, *args)

    call2._B, call2._jf = B, jf
    return call2


def jit_sealed(B: "CkksBackend", fn, *example_args, seq_keys: bool = False):
    """jax.jit `fn` with the backend's key material and cached plaintext
    encodings passed as ARGUMENTS rather than captured constants.

    Naively jitting an encrypted kernel closes over the relin/Galois keys and
    every encoded mask — gigabytes of inline HLO constants at production
    parameters, which bloats the executable (XLA materializes constants per
    program) and overwhelms remote-compile transports. Here:

      1. an eval_shape pass over `example_args` runs all host-side mask
         encodings once, populating B._plain_cache with concrete arrays
         (no device compute, no compile);
      2. the jitted wrapper takes (relin, galois, plain_cache, *args) as
         pytree inputs and temporarily installs them on the backend during
         tracing, so the lowered program references them as parameters.

    Returns a callable with `fn`'s original signature.
    """
    import jax

    ev = B.ev

    def inner(relin, galois, plains, *args):
        saved = ev.relin_key, ev.galois_keys, B._plain_cache, B._seq
        ev.relin_key, ev.galois_keys = relin, galois
        B._plain_cache = plains
        B._seq = [0] if seq_keys else None
        try:
            return fn(*args)
        finally:
            (ev.relin_key, ev.galois_keys, B._plain_cache, B._seq) = saved

    # Warm the plaintext-encoding cache host-side (abstract ciphertexts,
    # concrete masks/levels).
    if seq_keys:
        saved_cache, saved_seq = B._plain_cache, B._seq
        B._plain_cache, B._seq = {}, [0]
        try:
            jax.eval_shape(fn, *example_args)
            cache = B._plain_cache
        finally:
            B._plain_cache, B._seq = saved_cache, saved_seq
    else:
        jax.eval_shape(fn, *example_args)
        cache = None
    jf = jax.jit(inner)

    def call(*args):
        return jf(ev.relin_key, ev.galois_keys,
                  cache if cache is not None else B._plain_cache, *args)

    call._B, call._jf = B, jf
    return call
