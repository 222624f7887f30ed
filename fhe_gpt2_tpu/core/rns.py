"""RNS base tooling: punctured products, approximate base conversion, exact
scaling (rescale / special-prime mod-down).

Functional counterpart of the reference's ``util/rns.{h,cpp}`` (BaseConverter,
RNSTool, divide_and_round_q_last) restricted to what the CKKS path needs, and
reformulated as batched device ops: a base conversion is one fused
multiply-accumulate over the source-limb axis rather than a per-coefficient
scalar loop.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import numpy as np
import jax
import jax.numpy as jnp

from . import primes
from .modmath import (
    add_mod, sub_mod, mul_mod, mul_mod_shoup, barrett_reduce, barrett_ratio,
    shoup, word_dtype, word_bits_of,
)


def _wcol(vals, dt):
    return jnp.asarray(np.array(vals, dtype=dt).reshape(-1, 1))


@dataclass(frozen=True)
class BaseConvTables:
    """Constants for approximate conversion from base `src` to base `dst`.

    out_j = Σ_i [x_i · (S/s_i)^{-1}]_{s_i} · (S/s_i) mod d_j   (+ small k·S slack)
    """

    src: tuple            # source moduli (host ints)
    dst: tuple            # destination moduli
    inv_punc: jnp.ndarray         # [ks,1]  [(S/s_i)^{-1}]_{s_i}
    inv_punc_shoup: jnp.ndarray   # [ks,1]
    src_q: jnp.ndarray            # [ks,1]
    punc_mod_dst: jnp.ndarray     # [ks,kd] (S/s_i) mod d_j
    dst_q: jnp.ndarray            # [kd,1]
    dst_r0: jnp.ndarray           # [kd,1]
    dst_r1: jnp.ndarray           # [kd,1]


def _register_table_pytree(cls, aux_fields: tuple[str, ...]):
    leaf_fields = tuple(f.name for f in fields(cls) if f.name not in aux_fields)

    def flatten(t):
        return (tuple(getattr(t, f) for f in leaf_fields),
                tuple(getattr(t, f) for f in aux_fields))

    def unflatten(aux, children):
        return cls(**dict(zip(aux_fields, aux)), **dict(zip(leaf_fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)


_register_table_pytree(BaseConvTables, ("src", "dst"))


def make_base_conv(src: list[int], dst: list[int]) -> BaseConvTables:
    dt = word_dtype(list(src) + list(dst))
    wb = word_bits_of(dt)
    S = 1
    for s in src:
        S *= s
    ks, kd = len(src), len(dst)
    inv_punc = []
    inv_punc_sh = []
    for s in src:
        punc = S // s
        iv = primes.mod_inverse(punc % s, s)
        inv_punc.append(iv)
        inv_punc_sh.append(shoup(iv, s, wb))
    punc_mod = np.zeros((ks, kd), dtype=dt)
    for i, s in enumerate(src):
        punc = S // s
        for j, d in enumerate(dst):
            punc_mod[i, j] = punc % d
    r0 = [barrett_ratio(d, wb)[0] for d in dst]
    r1 = [barrett_ratio(d, wb)[1] for d in dst]
    return BaseConvTables(
        src=tuple(src), dst=tuple(dst),
        inv_punc=_wcol(inv_punc, dt), inv_punc_shoup=_wcol(inv_punc_sh, dt),
        src_q=_wcol(src, dt),
        punc_mod_dst=jnp.asarray(punc_mod),
        dst_q=_wcol(dst, dt), dst_r0=_wcol(r0, dt), dst_r1=_wcol(r1, dt),
    )


def base_convert_mac(y: jnp.ndarray, t: BaseConvTables) -> jnp.ndarray:
    """MAC half of a base conversion from precomputed y_i = [x_i·(S/s_i)^{-1}]:
    out[..., j, n] = Σ_i y[..., i, n] · (S/s_i) mod d_j."""
    ks, kd = len(t.src), len(t.dst)
    acc = None
    for i in range(ks):
        yi = y[..., i:i + 1, :]                     # [..., 1, N]
        w = t.punc_mod_dst[i].reshape(kd, 1)        # [kd, 1]
        term = mul_mod(
            jnp.broadcast_to(yi, (*yi.shape[:-2], kd, yi.shape[-1])),
            w, t.dst_q, t.dst_r0, t.dst_r1,
        )
        acc = term if acc is None else add_mod(acc, term, t.dst_q)
    return acc


def base_convert(x: jnp.ndarray, t: BaseConvTables) -> jnp.ndarray:
    """Approximate RNS base conversion.

    x: uint64[..., ks, N] coefficients in the source base (coeff domain).
    Returns uint64[..., kd, N].
    """
    y = mul_mod_shoup(x, t.inv_punc, t.inv_punc_shoup, t.src_q)  # [..., ks, N]
    return base_convert_mac(y, t)


@dataclass(frozen=True)
class DropLastTables:
    """Constants for exact divide-and-round by the last modulus q_last.

    Mirrors the reference's ``divide_and_round_q_last_inplace``
    (util/rns.cpp:696): x_j <- (x_j - [x_last + q_last/2]_{q_j} + q_last/2·? )
    · q_last^{-1} mod q_j with centered rounding.
    """

    q_last: int
    half: jnp.ndarray            # scalar uint64 q_last >> 1
    half_mod: jnp.ndarray        # [k,1]  (q_last>>1) mod q_j
    inv_qlast: jnp.ndarray       # [k,1]  q_last^{-1} mod q_j
    inv_qlast_shoup: jnp.ndarray
    q: jnp.ndarray               # [k,1] remaining moduli
    r1: jnp.ndarray              # [k,1] barrett ratio hi for remaining moduli
    qlast_q: jnp.ndarray         # scalar uint64 q_last
    qlast_r1: jnp.ndarray        # scalar barrett hi for q_last


_register_table_pytree(DropLastTables, ("q_last",))


def make_drop_last(remaining: list[int], q_last: int) -> DropLastTables:
    dt = word_dtype(list(remaining) + [q_last])
    wb = word_bits_of(dt)
    jdt = jnp.uint32 if wb == 32 else jnp.uint64
    half = q_last >> 1
    inv = [primes.mod_inverse(q_last % q, q) for q in remaining]
    return DropLastTables(
        q_last=q_last,
        half=jdt(half),
        half_mod=_wcol([half % q for q in remaining], dt),
        inv_qlast=_wcol(inv, dt),
        inv_qlast_shoup=_wcol(
            [shoup(v, q, wb) for v, q in zip(inv, remaining)], dt),
        q=_wcol(remaining, dt),
        r1=_wcol([barrett_ratio(q, wb)[1] for q in remaining], dt),
        qlast_q=jdt(q_last),
        qlast_r1=jdt(barrett_ratio(q_last, wb)[1]),
    )


@dataclass(frozen=True)
class ModDownTables:
    """Constants for ONE-SHOT divide-and-round by P = prod(special primes).

    Replaces the special-prime-at-a-time drop loop (k iterations of
    divide_and_round_q_last, ~k·l limb NTTs) with a single fast base
    conversion P-basis → Q-basis (Halevi-Polyakov-Shoup approximate
    mod-down, the scheme every GPU/accelerator CKKS uses): k limb iNTTs +
    l limb NTTs total. The centered P/2 shift keeps the rounding error at
    ≤ k integer units — far below the encryption noise floor. For k = 1
    this is algebraically identical to the exact drop (pinned by the SEAL
    bit-exact vectors, tests/test_seal_vectors.py).
    """

    bct: BaseConvTables          # src = special primes, dst = remaining q
    half_p: jnp.ndarray          # [k,1]  (P>>1) mod p_i
    half_q: jnp.ndarray          # [l,1]  (P>>1) mod q_j
    inv_p: jnp.ndarray           # [l,1]  P^{-1} mod q_j
    inv_p_shoup: jnp.ndarray     # [l,1]
    p_invf: jnp.ndarray          # [k,1]  float32 1/p_i (overflow estimator)
    p_mod_q: jnp.ndarray         # [l,1]  P mod q_j


_register_table_pytree(ModDownTables, ())


def make_mod_down(remaining: list[int], specials: list[int]) -> ModDownTables:
    dt = word_dtype(list(remaining) + list(specials))
    wb = word_bits_of(dt)
    P = 1
    for p in specials:
        P *= p
    half = P >> 1
    inv = [primes.mod_inverse(P % q, q) for q in remaining]
    return ModDownTables(
        bct=make_base_conv(specials, remaining),
        half_p=_wcol([half % p for p in specials], dt),
        half_q=_wcol([half % q for q in remaining], dt),
        inv_p=_wcol(inv, dt),
        inv_p_shoup=_wcol([shoup(v, q, wb) for v, q in zip(inv, remaining)],
                          dt),
        p_invf=jnp.asarray(np.array([1.0 / p for p in specials],
                                    dtype=np.float32).reshape(-1, 1)),
        p_mod_q=_wcol([P % q for q in remaining], dt),
    )


def mod_down_convert(a: jnp.ndarray, t: ModDownTables) -> jnp.ndarray:
    """Centered conversion of a[..., k, N] (residues mod the special primes)
    into the destination base, with floating-point correction of the fast
    conversion's +u·P overflow (Halevi-Polyakov-Shoup): u = floor(Σ v_i/p_i)
    is recovered exactly from a float32 sum (each v_i/p_i ∈ [0,1); error
    ~k·2^-23 flips a unit only when the fraction sits within that margin of
    an integer — rare ±1-unit rounding, unbiased). Returns the image of the
    centered representative minus P/2, i.e. subtracting it from x and
    multiplying by P^{-1} performs round-to-nearest division by P.
    """
    a = add_mod(a, t.half_p, t.bct.src_q)
    v = mul_mod_shoup(a, t.bct.inv_punc, t.bct.inv_punc_shoup, t.bct.src_q)
    img = base_convert_mac(v, t.bct)
    f = jnp.sum(v.astype(jnp.float32) * t.p_invf, axis=-2, keepdims=True)
    # u ∈ [0, k-1] mathematically (r < kP); the clamp also makes k=1 exactly
    # u=0 even when float32 rounds (p-1)/p up to 1.0 (k=1 bit-exactness).
    k = v.shape[-2]
    u = jnp.clip(jnp.floor(f), 0.0, float(k - 1)).astype(img.dtype)
    img = sub_mod(img, mul_mod(u, t.p_mod_q, t.bct.dst_q,
                               t.bct.dst_r0, t.bct.dst_r1), t.bct.dst_q)
    return sub_mod(img, t.half_q, t.bct.dst_q)


def divide_round_last(x: jnp.ndarray, last: jnp.ndarray, t: DropLastTables):
    """Exact centered divide-and-round of an RNS poly by its last modulus.

    x: uint64[..., k, N] remaining limbs, last: uint64[..., N] dropped limb
    (both in coefficient domain). Returns uint64[..., k, N].
    """
    # Center-round: add q_last/2 to the dropped limb, then for each remaining
    # modulus subtract its image and multiply by q_last^{-1}.
    shifted = add_mod(last, t.half, t.qlast_q)            # [..., N]
    img = barrett_reduce(shifted[..., None, :], t.q, t.r1)  # [..., k, N]
    img = sub_mod(img, t.half_mod, t.q)
    diff = sub_mod(x, img, t.q)
    return mul_mod_shoup(diff, t.inv_qlast, t.inv_qlast_shoup, t.q)
