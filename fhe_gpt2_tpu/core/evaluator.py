"""CKKS evaluator: the public op surface of the crypto core.

Functional counterpart of the reference's Evaluator (evaluator.{h,cpp})
including its modifications: const/vector ops (evaluator.h:1189-1213) and the
reduced-error scale/level-matching ops of Kim et al. CT-RSA'22
(evaluator.h:1216-1284). Differences by design (TPU-first, not a port):

  * Everything is a pure function over Ciphertext pytrees; jit the composition,
    not individual ops. No Decryptor threading through kernels (the
    reference's debug-probe design smell — SURVEY §4).
  * Ciphertexts stay in NTT form; rescale and key-switch mod-down use the
    single-limb iNTT trick (divide_and_round_q_last_ntt semantics,
    util/rns.cpp:696) formulated as batched array ops.
  * Key switching is the SEAL-3.6 hybrid scheme (digit per limb, special
    prime; evaluator.cpp:2281) with the digit loop expressed as one batched
    NTT + fused multiply-accumulate — the shape XLA/MXU wants.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import embedding, ntt as nttmod
from .context import CkksContext
from .keys import KeyGenerator, KSwitchKey, PublicKey, SecretKey, GaloisKeys, \
    sample_gaussian, sample_ternary, sample_uniform_rns, _to_rns
from .modmath import (
    add_mod, sub_mod, neg_mod, mul_mod, mul_mod_shoup, barrett_reduce,
    barrett_ratio, shoup,
)
from .rns import DropLastTables, base_convert


# ---------------------------------------------------------------------------
# Data types
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass
class Ciphertext:
    """RNS-CKKS ciphertext. data: uint64[k, *batch, l, N] in NTT form.

    The component axis comes first so c0/c1/c2 are plain leading indexes;
    arbitrary batch dims may sit between it and the (limb, coeff) trailing
    axes — every evaluator op broadcasts over them, so a stack of 8 packed
    matrix ciphertexts is one array and one dispatch.
    """

    data: jnp.ndarray
    scale: float

    @property
    def k(self) -> int:
        return self.data.shape[0]

    @property
    def level(self) -> int:
        return self.data.shape[-2]

    @property
    def batch(self) -> tuple:
        return self.data.shape[1:-2]

    def tree_flatten(self):
        return (self.data,), (self.scale,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(data=children[0], scale=aux[0])


@jax.tree_util.register_pytree_node_class
@dataclass
class Plaintext:
    """Encoded plaintext. data: uint64[l, N] in NTT form."""

    data: jnp.ndarray
    scale: float

    @property
    def level(self) -> int:
        return self.data.shape[-2]

    def tree_flatten(self):
        return (self.data,), (self.scale,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(data=children[0], scale=aux[0])


def _scales_close(a: float, b: float, tol=1e-6):
    return abs(a - b) <= tol * max(abs(a), abs(b))


# ---------------------------------------------------------------------------
# Modular sum with bounded lazy accumulation
# ---------------------------------------------------------------------------

def mod_sum(x: jnp.ndarray, q, ratio1, axis: int = 0, group: int = 0):
    """Sum x (entries < q < 2^(w-2)) along `axis` mod q.

    Accumulates raw words within groups of `group` (no overflow while
    group * q < 2^w, i.e. 8 for u64 moduli < 2^61, 2 for u32 moduli < 2^31)
    and Barrett-reduces per group, then folds groups with add_mod.
    """
    from .modmath import lazy_group
    group = group or lazy_group(x.dtype)
    n = x.shape[axis]
    x = jnp.moveaxis(x, axis, 0)
    pad = (-n) % group
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)])
    x = x.reshape(-1, group, *x.shape[1:])
    # dtype= pins the accumulator: jnp.sum would promote uint32 to uint64,
    # which silently breaks the word-size dispatch inside barrett_reduce.
    s = barrett_reduce(jnp.sum(x, axis=1, dtype=x.dtype), q, ratio1)
    out = s[0]
    for i in range(1, s.shape[0]):
        out = add_mod(out, s[i], q)
    return out


# ---------------------------------------------------------------------------
# Jitted cores (module-level so each shape compiles exactly once)
# ---------------------------------------------------------------------------

@jax.jit
def _drop_last_core(x, t_rem, t_last, dlt: DropLastTables):
    """Exact divide-and-round of NTT-form x[..., l, N] by its trailing limb
    (divide_and_round_q_last_ntt semantics): iNTT only the dropped limb."""
    last = nttmod._intt(x[..., -1:, :], t_last)[..., 0, :]
    shifted = add_mod(last, dlt.half, dlt.qlast_q)
    img = barrett_reduce(shifted[..., None, :], dlt.q, dlt.r1)
    img = sub_mod(img, dlt.half_mod, dlt.q)
    img = nttmod._ntt(img, t_rem)
    diff = sub_mod(x[..., :-1, :], img, dlt.q)
    return mul_mod_shoup(diff, dlt.inv_qlast, dlt.inv_qlast_shoup, dlt.q)


@jax.jit
def _mod_down_core(x, t_sp, t_q, mdt):
    """One-shot divide-and-round of NTT-form x[..., l+k, N] by P =
    prod(special primes): iNTT the k special limbs, centered fast base
    conversion with float overflow correction into the q basis
    (rns.mod_down_convert), one NTT of the correction, multiply by P^{-1}.
    k+l limb transforms vs the per-prime drop loop's ~k·l — the keyswitch
    mod-down at GPU-CKKS cost, with exact-drop-grade rounding noise."""
    from .rns import mod_down_convert
    l = x.shape[-2] - t_sp.q.shape[0]
    a = nttmod._intt(x[..., l:, :], t_sp)
    img = mod_down_convert(a, mdt)
    img = nttmod._ntt(img, t_q)
    diff = sub_mod(x[..., :l, :], img, t_q.q)
    return mul_mod_shoup(diff, mdt.inv_p, mdt.inv_p_shoup, t_q.q)


@jax.jit
def _decompose_core(c, kt, lt, bcts, own_mask):
    """Hybrid digit decomposition of c[..., l, N] (NTT form).

    bcts: per-digit BaseConvTables (digit's active limb group -> full key
    basis); own_mask: bool [D, l+k, 1] marking each digit's own data limbs.
    Returns tpoly [..., D, l+k, N] — the expensive half of a key switch,
    shared across hoisted rotations. On a digit's own limbs the conversion
    is exact mod q_i (the +k·Q_j slack vanishes), so the original NTT form
    is spliced in there and those limbs skip the iNTT→reduce→NTT round trip.
    """
    c_coeff = nttmod._intt(c, lt)
    start, digs = 0, []
    for bct in bcts:
        w = len(bct.src)
        digs.append(base_convert(c_coeff[..., start:start + w, :], bct))
        start += w
    r = jnp.stack(digs, axis=-3)                  # [..., D, l+k, N]
    tpoly = nttmod._ntt(r, kt)
    k_sp = tpoly.shape[-2] - c.shape[-2]
    pad = jnp.zeros((*c.shape[:-2], k_sp, c.shape[-1]), c.dtype)
    c_pad = jnp.concatenate([c, pad], axis=-2)    # [..., l+k, N]
    return jnp.where(own_mask, c_pad[..., None, :, :], tpoly)


@jax.jit
def _ks_mac_core(tpoly, kdata, kt):
    """MAC half of a key switch over the digit axis (no mod-down).

    tpoly: [..., D, l+k, N]; kdata: [2, D, l+k, N]. Returns [2, ..., l+k, N].
    """
    D = tpoly.shape[-3]
    nk = tpoly.shape[-2]
    batch_ndim = tpoly.ndim - 3
    kdata = kdata.reshape(2, *(1,) * batch_ndim, D, nk, kdata.shape[-1])
    prod = mul_mod(tpoly[None], kdata, kt.q, kt.ratio0, kt.ratio1)
    return mod_sum(prod, kt.q, kt.ratio1, axis=-3)


def _fused_ks_mode(kt):
    """None (split decompose/MAC path), "tpu", or "interpret": the fused
    Pallas key-switch kernel (core/tks.py). Default ON for the uint32 engine
    (TPU-profiled r5: 201.3 vs 195.0 ops/s ct-mult+relin at logN=15/L=22 and
    ~30% faster XLA compiles; bit-exact vs the split path,
    tests/test_fused_ks.py). Opt out with FHE_FUSED_KS=0."""
    import os
    if kt.fs is None or os.environ.get("FHE_FUSED_KS", "1") == "0":
        return None
    if jax.default_backend() == "tpu":
        return "tpu"
    if os.environ.get("FHE_PALLAS_INTERPRET") == "1":
        return "interpret"
    return None


class Evaluator:
    """Stateless op library bound to a context (and optionally keys)."""

    def __init__(self, ctx: CkksContext, relin_key: Optional[KSwitchKey] = None,
                 galois_keys: Optional[GaloisKeys] = None):
        self.ctx = ctx
        self.relin_key = relin_key
        self.galois_keys = galois_keys

    # -- encoding -----------------------------------------------------------

    def make_plain(self, values, scale: float, level: int) -> Plaintext:
        """Host-encode a slot vector into an NTT-form plaintext.

        Inputs are always host data, so the encoding is forced concrete even
        when called mid-trace — plaintexts are cached (nn/backend.py) and
        reused across jit traces, and must never capture tracers."""
        res = embedding.encode(values, scale, self.ctx, tuple(range(level)))
        t = self.ctx.tables(level)
        with jax.ensure_compile_time_eval():
            return Plaintext(data=nttmod._ntt_stages(jnp.asarray(res), t),
                             scale=scale)

    def decode_plain(self, pt: Plaintext, num_slots=None) -> np.ndarray:
        t = self.ctx.tables(pt.level)
        res = np.asarray(nttmod.intt(pt.data, t))
        return embedding.decode(res, pt.scale, self.ctx,
                                tuple(range(pt.level)), num_slots)

    # -- add/sub/neg --------------------------------------------------------

    def _t(self, level: int):
        return self.ctx.tables(level)

    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        assert a.level == b.level and _scales_close(a.scale, b.scale), (
            f"add: level/scale mismatch {a.level}/{a.scale} vs {b.level}/{b.scale}")
        t = self._t(a.level)
        return Ciphertext(add_mod(a.data, b.data, t.q), a.scale)

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        assert a.level == b.level and _scales_close(a.scale, b.scale)
        t = self._t(a.level)
        return Ciphertext(sub_mod(a.data, b.data, t.q), a.scale)

    def negate(self, a: Ciphertext) -> Ciphertext:
        t = self._t(a.level)
        return Ciphertext(neg_mod(a.data, t.q), a.scale)

    def add_plain(self, a: Ciphertext, p: Plaintext) -> Ciphertext:
        assert a.level == p.level and _scales_close(a.scale, p.scale)
        t = self._t(a.level)
        return Ciphertext(
            a.data.at[0].set(add_mod(a.data[0], p.data, t.q)), a.scale)

    def sub_plain(self, a: Ciphertext, p: Plaintext) -> Ciphertext:
        assert a.level == p.level and _scales_close(a.scale, p.scale)
        t = self._t(a.level)
        return Ciphertext(
            a.data.at[0].set(sub_mod(a.data[0], p.data, t.q)), a.scale)

    # -- const/vector ops (reference's new API, evaluator.h:1189-1213) ------

    def add_const(self, a: Ciphertext, value: float) -> Ciphertext:
        """a + value broadcast over slots; free (no level/scale cost)."""
        m = int(round(value * a.scale))
        res = jnp.asarray(self.ctx.const_residues(m, tuple(range(a.level))))
        t = self._t(a.level)
        return Ciphertext(
            a.data.at[0].set(add_mod(a.data[0], res, t.q)), a.scale)

    def mul_const_int(self, a: Ciphertext, m: int) -> Ciphertext:
        """Multiply by an exact integer (scale unchanged). double_inplace = ×2."""
        res = jnp.asarray(self.ctx.const_residues(m, tuple(range(a.level))))
        t = self._t(a.level)
        return Ciphertext(
            mul_mod(a.data, res, t.q, t.ratio0, t.ratio1), a.scale)

    def mul_const(self, a: Ciphertext, value: float,
                  const_scale: Optional[float] = None) -> Ciphertext:
        """Multiply all slots by a real constant encoded at const_scale
        (defaults to the context scale). Output scale multiplies."""
        cs = const_scale if const_scale is not None else self.ctx.params.scale
        m = int(round(value * cs))
        out = self.mul_const_int(a, m)
        return replace(out, scale=a.scale * cs)

    def mul_plain(self, a: Ciphertext, p: Plaintext) -> Ciphertext:
        assert a.level == p.level
        t = self._t(a.level)
        return Ciphertext(
            mul_mod(a.data, p.data, t.q, t.ratio0, t.ratio1),
            a.scale * p.scale)

    def mul_vector(self, a: Ciphertext, values,
                   const_scale: Optional[float] = None) -> Ciphertext:
        """multiply_vector: encode `values` on the host and multiply."""
        cs = const_scale if const_scale is not None else self.ctx.params.scale
        return self.mul_plain(a, self.make_plain(values, cs, a.level))

    # -- multiply / relinearize ---------------------------------------------

    def multiply(self, a: Ciphertext, b: Ciphertext,
                 relin: bool = True) -> Ciphertext:
        assert a.level == b.level and a.k == 2 and b.k == 2
        t = self._t(a.level)

        def mm(x, y):
            return mul_mod(x, y, t.q, t.ratio0, t.ratio1)

        d0 = mm(a.data[0], b.data[0])
        d1 = add_mod(mm(a.data[0], b.data[1]), mm(a.data[1], b.data[0]), t.q)
        d2 = mm(a.data[1], b.data[1])
        out = Ciphertext(jnp.stack([d0, d1, d2]), a.scale * b.scale)
        if relin:
            out = self.relinearize(out)
        return out

    def square(self, a: Ciphertext, relin: bool = True) -> Ciphertext:
        return self.multiply(a, a, relin=relin)

    def relinearize(self, a: Ciphertext) -> Ciphertext:
        assert a.k == 3 and self.relin_key is not None
        ks = self._switch_key(a.data[2], a.level, self.relin_key)
        return Ciphertext(
            jnp.stack([add_mod(a.data[0], ks[0], self._t(a.level).q),
                       add_mod(a.data[1], ks[1], self._t(a.level).q)]),
            a.scale)

    # -- rescale / mod switch -----------------------------------------------

    def _ntt_drop_last(self, x: jnp.ndarray, rem_limbs: tuple[int, ...],
                       last_limb: int, dlt: DropLastTables) -> jnp.ndarray:
        """Drop the trailing limb of NTT-form x[..., l, N] with exact
        divide-and-round (divide_and_round_q_last_ntt semantics)."""
        return _drop_last_core(
            x, self.ctx.tables(rem_limbs), self.ctx.tables((last_limb,)), dlt)

    def rescale(self, a: Ciphertext) -> Ciphertext:
        """Divide by the trailing rescale unit — one prime q_{l-1}, or the
        trailing PAIR under composite scaling (rescale_limbs=2), where one
        logical rescale is two exact single-prime divide-and-rounds."""
        ctx = self.ctx
        g = ctx.rescale_limbs
        assert a.level - g >= ctx.base_limbs, (
            "rescale at the chain floor: out of levels (bootstrap needed)")
        l = a.level
        if g == 1:
            dlt = ctx.drop_last_tables(l)
            data = self._ntt_drop_last(
                a.data, tuple(range(l - 1)), l - 1, dlt)
        else:
            # One-shot drop of the trailing pair (HPS fast base conversion,
            # same core as the key-switch mod-down): g limb iNTTs + one NTT
            # instead of g sequential exact drops.
            mode = _fused_ks_mode(ctx.tables(l - g))
            if mode:
                from . import tks
                data = tks.fused_mod_down(
                    a.data, ctx.tables(tuple(range(l - g, l))),
                    ctx.tables(l - g), ctx.fused_md_tables(l, pair=True),
                    interpret=mode == "interpret")
            else:
                data = _mod_down_core(
                    a.data, ctx.tables(tuple(range(l - g, l))),
                    ctx.tables(l - g), ctx.rescale_pair_tables(l))
        return Ciphertext(data, a.scale / float(
            np.prod([ctx.moduli[i] for i in range(l - g, l)])))

    def mod_switch_drop(self, a: Ciphertext, levels: int = 1) -> Ciphertext:
        """Drop limbs without scaling (mod_switch_to_next)."""
        assert a.level - levels >= 1
        return Ciphertext(a.data[..., : a.level - levels, :], a.scale)

    def mod_switch_to(self, a: Ciphertext, level: int) -> Ciphertext:
        return self.mod_switch_drop(a, a.level - level) if a.level > level else a

    # -- key switching ------------------------------------------------------

    def _ks_structs(self, level: int):
        """(key tables, per-digit conv tables, own-limb mask, digit count)."""
        ctx = self.ctx
        key_limbs = ctx.key_limbs(level)
        groups = ctx.digit_groups(level)
        D = len(groups)
        own = np.zeros((D, len(key_limbs), 1), dtype=bool)
        for j, g in enumerate(groups):
            own[j, list(g)] = True
        return (ctx.tables(key_limbs), ctx.decomp_tables(level),
                jnp.asarray(own), D)

    def _slice_key(self, ksk: KSwitchKey, level: int, D: int) -> jnp.ndarray:
        """Active digits/limbs of a key: [2, D, l+k, N]."""
        key_limbs = self.ctx.key_limbs(level)
        return jnp.moveaxis(
            jnp.take(ksk.data[:D], jnp.asarray(key_limbs), axis=2), 1, 0)

    def _mod_down_special(self, x: jnp.ndarray, level: int) -> jnp.ndarray:
        """Divide-and-round of NTT-form x[..., l+k, N] by P = prod of
        special primes — one-shot fast base conversion (see _mod_down_core).
        Bit-identical to the exact per-prime drop when k_sp == 1."""
        ctx = self.ctx
        sp_idx = tuple(ctx.L + i for i in range(ctx.k_sp))
        mode = _fused_ks_mode(ctx.tables(level))
        if mode:
            from . import tks
            return tks.fused_mod_down(
                x, ctx.tables(sp_idx), ctx.tables(level),
                ctx.fused_md_tables(level), interpret=mode == "interpret")
        return _mod_down_core(x, ctx.tables(sp_idx), ctx.tables(level),
                              ctx.mod_down_onestep_tables(level))

    def _switch_key(self, c: jnp.ndarray, level: int,
                    ksk: KSwitchKey) -> jnp.ndarray:
        """Switch an NTT-form poly c[..., l, N] to the secret key basis.

        Returns [2, ..., l, N] (already mod-downed past the special primes).
        Batched over any leading dims of c; the digit loop is one fused
        batched NTT + multiply-accumulate (the reference's scalar loop at
        evaluator.cpp:2281, reshaped for the MXU/VPU), with digits of
        alpha = k_sp limbs (hybrid dnum scheme; alpha=1 matches SEAL-3.6).
        """
        ctx = self.ctx
        l = level
        kt, bcts, own, D = self._ks_structs(l)
        mode = _fused_ks_mode(kt)
        if mode:
            from . import tks
            acc = tks.fused_switch_key(
                c, self._slice_key(ksk, l, D), ctx.tables(l), kt,
                ctx.fused_ks_tables(l), interpret=mode == "interpret")
        else:
            tpoly = _decompose_core(c, kt, ctx.tables(l), bcts, own)
            acc = _ks_mac_core(tpoly, self._slice_key(ksk, l, D), kt)
        return self._mod_down_special(acc, l)

    def apply_galois(self, a: Ciphertext, galois_elt: int) -> Ciphertext:
        """Galois automorphism + key switch (rotate/conjugate core)."""
        assert a.k == 2 and self.galois_keys is not None
        perm = self.ctx.galois_perm(galois_elt)
        permuted = jnp.take(a.data, perm, axis=-1)
        ks = self._switch_key(permuted[1], a.level, self.galois_keys[galois_elt])
        t = self._t(a.level)
        return Ciphertext(
            jnp.stack([add_mod(permuted[0], ks[0], t.q), ks[1]]), a.scale)

    def _hops(self, steps: int) -> list[int]:
        """Decompose a rotation into available key steps.

        Single hop when the exact key exists; otherwise greedy largest-
        available-step decomposition (the reference's memory_save_rotate,
        cnn_seal.cpp:788-810) — with a base-b digit key set
        ({b^k·j, j<b}, keys.digit_steps) any amount needs ≤ log_b(n) hops,
        shrinking Galois-key memory from one key per distinct amount
        (383 × ~137 MB for ResNet-20 at logN=15 — far beyond HBM) to ~45.
        """
        n2 = self.ctx.n // 2
        steps %= n2
        if steps == 0:
            return []
        have = self.galois_keys.step_set(self.ctx) if self.galois_keys else ()
        if steps in have:
            return [steps]
        hops = []
        rem = steps
        avail = sorted(have, reverse=True)
        while rem:
            nxt = next((s for s in avail if s <= rem), None)
            assert nxt is not None, (
                f"no Galois key path for rotation {steps} (have {len(avail)})")
            hops.append(nxt)
            rem -= nxt
        return hops

    def rotate(self, a: Ciphertext, steps: int) -> Ciphertext:
        """Rotate slots left by `steps` (rotate_vector semantics); composes
        multiple key switches when the exact key is absent (memory_save)."""
        for s in self._hops(steps):
            a = self.apply_galois(a, self.ctx.galois_elt_from_step(s))
        return a

    def rotate_hoisted(self, a: Ciphertext, steps: list[int]) -> list[Ciphertext]:
        """Many rotations of one ciphertext sharing a single digit
        decomposition (the hoisting optimization the reference implements in
        bsgs_linear_transform_hoisting, Bootstrapper.cpp:2091 — here it is
        the default multi-rotation path, per SURVEY §7 design deltas).

        The Galois automorphism commutes with per-coefficient digit
        decomposition, so the decomposed digits are permuted per step and
        only the MAC + mod-down run per rotation.
        """
        ctx = self.ctx
        l = a.level
        kt, bcts, own, D = self._ks_structs(l)
        tpoly = _decompose_core(a.data[1], kt, ctx.tables(l), bcts, own)
        out = []
        for s in steps:
            s = s % (ctx.n // 2)
            if s == 0:
                out.append(a)
                continue
            hops = self._hops(s)
            # First hop rides the shared decomposition; multi-hop residues
            # key-switch eagerly (memory_save_rotate composition).
            elt = ctx.galois_elt_from_step(hops[0])
            perm = ctx.galois_perm(elt)
            tp = jnp.take(tpoly, perm, axis=-1)
            acc = _ks_mac_core(tp, self._slice_key(self.galois_keys[elt], l, D), kt)
            ks = self._mod_down_special(acc, l)
            c0p = jnp.take(a.data[0], perm, axis=-1)
            t = self._t(l)
            r = Ciphertext(
                jnp.stack([add_mod(c0p, ks[0], t.q), ks[1]]), a.scale)
            for h in hops[1:]:
                r = self.apply_galois(r, ctx.galois_elt_from_step(h))
            out.append(r)
        return out

    def make_plain_ext(self, values, scale: float, level: int) -> Plaintext:
        """Encode a slot vector over the extended key basis QP (data limbs +
        special primes) — the operand form for double-hoisted masked sums."""
        limbs = self.ctx.key_limbs(level)
        res = embedding.encode(values, scale, self.ctx, limbs)
        t = self.ctx.tables(limbs)
        with jax.ensure_compile_time_eval():
            return Plaintext(data=nttmod._ntt_stages(jnp.asarray(res), t),
                             scale=scale)

    def hoisted_rotations_ext(self, a: Ciphertext,
                              steps: list[int]) -> list[jnp.ndarray]:
        """Double-hoisting (Bossuat et al. EUROCRYPT'21): rotations of one
        ciphertext kept in the extended QP basis, WITHOUT the per-rotation
        mod-down that dominates rotate_hoisted (each mod-down re-NTTs ~l
        limbs per special prime). Returns, per step, uint64[2, ..., l+k, N]
        representing P·(rotated ct): callers mask-multiply and accumulate in
        QP and pay a single mod-down per accumulator (see nn/linear.apply_lt).

        The reference has no counterpart (its hoisting variant
        bsgs_linear_transform_hoisting, Bootstrapper.cpp:2091, still
        mod-downs per rotation)."""
        ctx = self.ctx
        l = a.level
        kt, bcts, own, D = self._ks_structs(l)
        p_res, p_shoup = ctx.p_residues(l)
        t = self._t(l)
        def lift(ct_data):
            """P·ct in the extended basis (special-limb residues of P·x are
            exactly zero since every special prime divides P)."""
            pc = mul_mod_shoup(ct_data, p_res[:l], p_shoup[:l], t.q)
            pad = jnp.zeros((*pc.shape[:-2], ctx.k_sp, pc.shape[-1]),
                            pc.dtype)
            return jnp.concatenate([pc, pad], axis=-2)

        tpoly = None
        out = []
        for s in steps:
            s = s % (ctx.n // 2)
            if s == 0:
                out.append(lift(a.data))
                continue
            if len(self._hops(s)) > 1:
                # No single-hop key: rotate fully (memory_save composition)
                # and lift the result into the extended basis.
                out.append(lift(self.rotate(a, s).data))
                continue
            if tpoly is None:
                tpoly = _decompose_core(a.data[1], kt, ctx.tables(l), bcts, own)
            elt = ctx.galois_elt_from_step(s)
            perm = ctx.galois_perm(elt)
            tp = jnp.take(tpoly, perm, axis=-1)
            acc = _ks_mac_core(
                tp, self._slice_key(self.galois_keys[elt], l, D), kt)
            c0p = jnp.take(a.data[0], perm, axis=-1)
            pc0 = mul_mod_shoup(c0p, p_res[:l], p_shoup[:l], t.q)
            e0 = acc[0].at[..., :l, :].set(
                add_mod(acc[0][..., :l, :], pc0, t.q))
            out.append(jnp.stack([e0, acc[1]]))
        return out

    def mod_down_ext(self, data: jnp.ndarray, level: int,
                     scale: float) -> Ciphertext:
        """Divide an extended-basis accumulator [2, ..., l+k, N] by P (exact
        divide-and-round) — the single deferred mod-down of double-hoisting."""
        return Ciphertext(self._mod_down_special(data, level), scale)

    def conjugate(self, a: Ciphertext) -> Ciphertext:
        return self.apply_galois(a, self.ctx.galois_elt_conjugate)

    # -- reduced-error ops (Kim et al. CT-RSA'22; evaluator.h:1216-1284) ----

    def set_scale_exact(self, a: Ciphertext, target: float) -> Ciphertext:
        """Re-scale a ciphertext to EXACTLY `target`: multiply by 1.0 encoded
        at the corrective scale target*q_last/scale, then rescale (costs one
        level). At uint32-engine scales (~2**25) the primes sit up to ~2**-8
        off the scale, so the u64-style relabel trick would inject ~0.4%
        relative error; this lands exactly (reference counterpart: the
        encode-at-matching-scale reduced-error ops, evaluator.h:1269-1283)."""
        l = a.level
        assert l - self.ctx.rescale_limbs >= self.ctx.base_limbs, (
            "set_scale_exact: out of levels")
        q_last = self.ctx.rescale_divisor(l)
        cs = target * q_last / a.scale
        out = self.mul_plain(a, self.make_plain(
            np.ones(1, dtype=np.float64), cs, l))
        out = self.rescale(out)
        return replace(out, scale=float(target))

    def _match_scale_for_add(self, a: Ciphertext, b: Ciphertext):
        if _scales_close(a.scale, b.scale):
            return a, replace(b, scale=a.scale)
        if a.scale < b.scale:
            b, a = self._match_scale_for_add(b, a)
            return a, b
        f = a.scale / b.scale
        fi = int(round(f))
        if fi >= 1 and abs(f - fi) < 1e-6 * f:
            b = self.mul_const_int(b, fi)
            return a, replace(b, scale=a.scale)
        # Non-integer ratio (prime/scale drift): exact corrective multiply.
        b = self.set_scale_exact(b, a.scale)
        a = self.mod_switch_to(a, b.level)
        return a, b

    def add_reduced_error(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        l = min(a.level, b.level)
        a, b = self.mod_switch_to(a, l), self.mod_switch_to(b, l)
        a, b = self._match_scale_for_add(a, b)
        return self.add(a, b)

    def sub_reduced_error(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        l = min(a.level, b.level)
        a, b = self.mod_switch_to(a, l), self.mod_switch_to(b, l)
        neg = False
        if a.scale < b.scale:
            a, b, neg = b, a, True
        a, b = self._match_scale_for_add(a, b)
        out = self.sub(a, b)
        return self.negate(out) if neg else out

    def multiply_reduced_error(self, a: Ciphertext, b: Ciphertext,
                               relin: bool = True) -> Ciphertext:
        l = min(a.level, b.level)
        return self.multiply(self.mod_switch_to(a, l),
                             self.mod_switch_to(b, l), relin=relin)

    def rescale_to_scale(self, a: Ciphertext, target: float) -> Ciphertext:
        """Rescale once and relabel to `target` (absorbing the q/scale drift
        as approximation error, the reduced-error convention)."""
        out = self.rescale(a)
        assert _scales_close(out.scale, target, tol=0.05), (out.scale, target)
        return replace(out, scale=target)


def stack_cts(cts: list[Ciphertext], axis: int = 0) -> Ciphertext:
    """Stack same-shape ciphertexts along a new batch axis (after the
    component axis): [k, l, N] x B -> [k, B, l, N]."""
    assert all(_scales_close(c.scale, cts[0].scale) for c in cts)
    return Ciphertext(jnp.stack([c.data for c in cts], axis=1 + axis),
                      cts[0].scale)


def unstack_cts(ct: Ciphertext, axis: int = 0) -> list[Ciphertext]:
    n = ct.data.shape[1 + axis]
    return [Ciphertext(jnp.take(ct.data, i, axis=1 + axis), ct.scale)
            for i in range(n)]


# ---------------------------------------------------------------------------
# Encryptor / Decryptor (host-boundary ops)
# ---------------------------------------------------------------------------

class Encryptor:
    def __init__(self, ctx: CkksContext, secret: Optional[SecretKey] = None,
                 public: Optional[PublicKey] = None, seed: int = 1,
                 secure: bool = False, rng=None):
        self.ctx = ctx
        self.secret = secret
        self.public = public
        if rng is not None:
            self.rng = rng
        elif secure:
            from .csprng import ShakeRng
            self.rng = ShakeRng()
        else:
            self.rng = np.random.default_rng(seed)

    def encrypt_symmetric(self, pt: Plaintext, a=None) -> Ciphertext:
        ctx, l = self.ctx, pt.level
        t = ctx.tables(l)
        mods = [ctx.all_moduli[i] for i in range(l)]
        if a is None:
            a = jnp.asarray(sample_uniform_rns(self.rng, ctx.n, mods))
        e = jnp.asarray(_to_rns(
            sample_gaussian(self.rng, ctx.n, ctx.params.error_std), mods))
        s = self.secret.ntt[:l]
        b = add_mod(
            neg_mod(mul_mod(a, s, t.q, t.ratio0, t.ratio1), t.q),
            nttmod.ntt(e, t), t.q)
        b = add_mod(b, pt.data, t.q)
        return Ciphertext(jnp.stack([b, a]), pt.scale)

    def encrypt_symmetric_seeded(self, pt: Plaintext):
        """Fresh symmetric encryption whose uniform c1 component is expanded
        from a 32-byte SHAKE seed — SEAL's seeded-ciphertext compression
        (serialization.cpp seeded save): the wire form carries (c0, seed),
        halving fresh-ciphertext size. Returns (Ciphertext, seed)."""
        import os as _os
        from .csprng import ShakeRng
        seed = _os.urandom(32)
        mods = [self.ctx.all_moduli[i] for i in range(pt.level)]
        a = jnp.asarray(expand_uniform(seed, self.ctx.n, mods,
                                       self.ctx.word))
        return self.encrypt_symmetric(pt, a=a), seed

    def encrypt(self, pt: Plaintext) -> Ciphertext:
        if self.public is None:
            return self.encrypt_symmetric(pt)
        return self.encrypt_asymmetric(pt)

    def encrypt_asymmetric(self, pt: Plaintext) -> Ciphertext:
        """pk encryption at key level, mod-down past special primes
        (encryptor.cpp encrypt_zero semantics), then add the plaintext."""
        ctx = self.ctx
        all_idx = tuple(range(len(ctx.all_moduli)))
        t = ctx.tables(all_idx)
        mods = list(ctx.all_moduli)
        u = jnp.asarray(_to_rns(sample_ternary(self.rng, ctx.n), mods))
        u_ntt = nttmod.ntt(u, t)
        cts = []
        for c in range(2):
            e = jnp.asarray(_to_rns(
                sample_gaussian(self.rng, ctx.n, ctx.params.error_std), mods))
            cts.append(add_mod(
                mul_mod(self.public.data[c], u_ntt, t.q, t.ratio0, t.ratio1),
                nttmod.ntt(e, t), t.q))
        data = jnp.stack(cts)   # [2, L+k, N] at key level
        # Mod down through the special primes.
        data = Evaluator(ctx)._mod_down_special(data, ctx.L)
        data = data[:, : pt.level]
        tq = ctx.tables(pt.level).q
        data = data.at[0].set(add_mod(data[0], pt.data, tq))
        return Ciphertext(data, pt.scale)


def expand_uniform(seed: bytes, n: int, moduli, word) -> np.ndarray:
    """Deterministic SHAKE-256 expansion of a uniform RNS poly (the c1 of a
    seeded ciphertext). Platform-independent: both ends regenerate the same
    array from the 32-byte seed."""
    from .csprng import ShakeRng
    rng = ShakeRng(seed)
    out = np.zeros((len(moduli), n), dtype=word)
    for i, q in enumerate(moduli):
        out[i] = rng.integers(0, int(q), size=n, dtype=np.uint64).astype(word)
    return out


class Decryptor:
    def __init__(self, ctx: CkksContext, secret: SecretKey):
        self.ctx = ctx
        self.secret = secret

    def decrypt_to_rns(self, ct: Ciphertext) -> np.ndarray:
        """c0 + c1·s (+ c2·s²) -> coefficient-domain RNS residues [l, N]."""
        l = ct.level
        t = self.ctx.tables(l)
        s = self.secret.ntt[:l]
        acc = ct.data[0]
        spow = s
        for j in range(1, ct.k):
            acc = add_mod(
                acc, mul_mod(ct.data[j], spow, t.q, t.ratio0, t.ratio1), t.q)
            if j + 1 < ct.k:
                spow = mul_mod(spow, s, t.q, t.ratio0, t.ratio1)
        return np.asarray(nttmod.intt(acc, t))

    def decrypt(self, ct: Ciphertext, num_slots=None) -> np.ndarray:
        res = self.decrypt_to_rns(ct)
        return embedding.decode(res, ct.scale, self.ctx,
                                tuple(range(ct.level)), num_slots)


def fake_bootstrap(ct: Ciphertext, dec: Decryptor, enc: Encryptor,
                   ev: Evaluator, target_level: int,
                   scale: Optional[float] = None) -> Ciphertext:
    """Decrypt/re-encrypt level reset — bring-up scaffolding only, mirroring
    the reference's fakeBootstrap (util.cpp:266-275). Replaced by boot/.
    Batched ciphertexts refresh element-wise (decode is per-ct)."""
    scale = scale or ev.ctx.params.scale
    if ct.batch:
        outs = [fake_bootstrap(c, dec, enc, ev, target_level, scale)
                for c in unstack_cts(ct)]
        return stack_cts(outs)
    z = dec.decrypt(ct)
    pt = ev.make_plain(z, scale, target_level)
    return enc.encrypt_symmetric(pt)
