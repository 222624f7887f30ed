"""Device-side modular arithmetic on JAX integer arrays, word-size generic.

Semantics mirror the reference's scalar kernels (seal-modified-3.6.6
``util/uintarithsmallmod.h``: Barrett 2w-bit reduction, Shoup multiplication)
but are formulated as vectorized ops over whole RNS limb arrays: a typical
operand is shaped ``[L, N]`` (limb-major, coefficients on the 128-lane axis)
with per-limb moduli/constants shaped ``[L, 1]`` broadcasting across
coefficients.

Two word sizes, selected by array dtype (static at trace time):

* **uint64** (moduli < 2**62) — the high-precision engine. On CPU these are
  native u64 ops; on TPU, XLA emulates 64-bit integers on 32-bit lanes
  (~4x the op count). This is the correctness oracle.
* **uint32** (moduli < 2**31) — the TPU-native engine. int32 multiply is a
  native VPU op; `mulhi` costs 4 multiplies via 16-bit splits instead of the
  u64 path's ~10 emulated ones, and all data/twiddle traffic halves. CKKS
  parameter sets with <2**31 moduli (single-prime ~2**25 scales, or
  composite two-prime scales) run this engine automatically — the word size
  is inferred from the modulus chain, never configured.

All arithmetic requirements scale with the word: for word w, moduli are
< 2**(w-2) so a+b never wraps and Barrett estimates are off by at most one
subtraction (SEAL's invariant, ``uintarithsmallmod.h``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Plain ints: weak-typed in jnp ops (no dtype promotion) and — unlike jnp
# scalars — legal inside Pallas kernels (no captured constants).
_M32 = 0xFFFFFFFF
_U32 = 32
_M16 = 0xFFFF
_U16 = 16


def word_dtype(moduli) -> np.dtype:
    """The engine word dtype for a modulus chain (host helper)."""
    return np.dtype(np.uint32) if max(moduli) < (1 << 31) else np.dtype(np.uint64)


def word_bits_of(dtype) -> int:
    return 32 if np.dtype(dtype) == np.uint32 else 64


def add_mod(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def sub_mod(a, b, q):
    return jnp.where(a >= b, a - b, a + q - b)


def neg_mod(a, q):
    return jnp.where(a == 0, a, q - a)


def mulhi(a, b):
    """High word of the double-width product a*b (same-dtype inputs).

    u64: 32-bit split (XLA further emulates each u64 op on TPU).
    u32: 16-bit split — every multiply is a native int32 VPU op."""
    if a.dtype == jnp.uint32:
        al = a & _M16
        ah = a >> _U16
        bl = b & _M16
        bh = b >> _U16
        t = al * bl
        t1 = ah * bl + (t >> _U16)
        t2 = al * bh + (t1 & _M16)
        return ah * bh + (t1 >> _U16) + (t2 >> _U16)
    al = a & _M32
    ah = a >> _U32
    bl = b & _M32
    bh = b >> _U32
    t = al * bl
    t1 = ah * bl + (t >> _U32)
    t2 = al * bh + (t1 & _M32)
    return ah * bh + (t1 >> _U32) + (t2 >> _U32)


def mulwide(a, b):
    """(hi, lo) words of the double-width product."""
    return mulhi(a, b), a * b


def barrett_reduce_wide(hi, lo, q, ratio0, ratio1):
    """Reduce a double-width value (hi,lo) mod q.

    ratio0/ratio1 are the low/high words of floor(2**(2w) / q). Mirrors the
    reference's ``barrett_reduce_128`` (util/uintarithsmallmod.h) including
    its one-conditional-subtraction invariant; the identical word-generic
    algorithm covers the u32 engine with ratio = floor(2**64 / q).
    """
    dt = lo.dtype
    # Round 1: q_hat += hi(lo * ratio0)
    carry = mulhi(lo, ratio0)
    tmp2_hi, tmp2_lo = mulwide(lo, ratio1)
    tmp1 = tmp2_lo + carry
    tmp3 = tmp2_hi + (tmp1 < tmp2_lo).astype(dt)
    # Round 2
    tmp2_hi, tmp2_lo = mulwide(hi, ratio0)
    s = tmp1 + tmp2_lo
    carry2 = tmp2_hi + (s < tmp1).astype(dt)
    # q_hat low word
    qhat = hi * ratio1 + tmp3 + carry2
    r = lo - qhat * q
    return jnp.where(r >= q, r - q, r)


def barrett_reduce(a, q, ratio1):
    """Reduce a full-word a mod q given ratio1 = floor(2**(2w)/q) >> w."""
    qhat = mulhi(a, ratio1)
    r = a - qhat * q
    return jnp.where(r >= q, r - q, r)


def mul_mod(a, b, q, ratio0, ratio1):
    """a*b mod q for arbitrary a,b < q (Barrett)."""
    hi, lo = mulwide(a, b)
    return barrett_reduce_wide(hi, lo, q, ratio0, ratio1)


def mul_mod_shoup(a, w, w_shoup, q):
    """a*w mod q where w is a precomputed constant with w_shoup=floor(w·2^w/q).

    Harvey/Shoup multiplication: one mulhi + two mullo. Result < 2q is
    corrected with one conditional subtraction.
    """
    qhat = mulhi(a, w_shoup)
    r = a * w - qhat * q
    return jnp.where(r >= q, r - q, r)


def mul_mod_shoup_lazy(a, w, w_shoup, q):
    """Like mul_mod_shoup but returns a value in [0, 2q)."""
    qhat = mulhi(a, w_shoup)
    return a * w - qhat * q


def lazy_group(dtype) -> int:
    """Max addends (< q < 2**(w-1) each) that a raw w-bit sum can take
    before a Barrett reduction is required."""
    return 8 if np.dtype(dtype) == np.uint64 else 2


# ---------------------------------------------------------------------------
# Host-side constant precomputation (Python ints; exact).
# ---------------------------------------------------------------------------

def barrett_ratio(q: int, word_bits: int = 64) -> tuple[int, int]:
    """(lo, hi) words of floor(2**(2w) / q)."""
    r = (1 << (2 * word_bits)) // q
    mask = (1 << word_bits) - 1
    return r & mask, r >> word_bits


def shoup(w: int, q: int, word_bits: int = 64) -> int:
    """floor(w * 2**w / q) for w < q."""
    return (w << word_bits) // q
