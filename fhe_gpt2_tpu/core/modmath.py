"""Device-side 64-bit modular arithmetic on JAX uint64 arrays.

Semantics mirror the reference's scalar kernels (seal-modified-3.6.6
``util/uintarithsmallmod.h``: Barrett 128-bit reduction, Shoup multiplication)
but are formulated as vectorized ops over whole RNS limb arrays: a typical
operand is shaped ``[L, N]`` (limb-major, coefficients on the 128-lane axis)
with per-limb moduli/constants shaped ``[L, 1]`` broadcasting across
coefficients.

On CPU these are native u64 ops; on TPU, XLA emulates 64-bit integers on
32-bit lanes. Pallas fast paths (u32-pair formulation) can shadow any of these
per-kernel; this module is the portable reference implementation and the
correctness oracle for those kernels.

All moduli are < 2**62 so a+b never wraps and Barrett estimates are off by at
most one subtraction (SEAL's invariant, ``uintarithsmallmod.h``).
"""

from __future__ import annotations

import jax.numpy as jnp

_M32 = jnp.uint64(0xFFFFFFFF)
_U32 = jnp.uint64(32)


def add_mod(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def sub_mod(a, b, q):
    return jnp.where(a >= b, a - b, a + q - b)


def neg_mod(a, q):
    return jnp.where(a == 0, a, q - a)


def mulhi(a, b):
    """High 64 bits of the 128-bit product a*b (u64 inputs)."""
    al = a & _M32
    ah = a >> _U32
    bl = b & _M32
    bh = b >> _U32
    t = al * bl
    t1 = ah * bl + (t >> _U32)
    t2 = al * bh + (t1 & _M32)
    return ah * bh + (t1 >> _U32) + (t2 >> _U32)


def mulwide(a, b):
    """(hi, lo) of the 128-bit product."""
    return mulhi(a, b), a * b


def barrett_reduce_wide(hi, lo, q, ratio0, ratio1):
    """Reduce a 128-bit value (hi,lo) mod q.

    ratio0/ratio1 are the low/high words of floor(2**128 / q). Mirrors the
    reference's ``barrett_reduce_128`` (util/uintarithsmallmod.h) including
    its one-conditional-subtraction invariant.
    """
    # Round 1: q_hat += hi64(lo * ratio0)
    carry = mulhi(lo, ratio0)
    tmp2_hi, tmp2_lo = mulwide(lo, ratio1)
    tmp1 = tmp2_lo + carry
    tmp3 = tmp2_hi + (tmp1 < tmp2_lo).astype(jnp.uint64)
    # Round 2
    tmp2_hi, tmp2_lo = mulwide(hi, ratio0)
    s = tmp1 + tmp2_lo
    carry2 = tmp2_hi + (s < tmp1).astype(jnp.uint64)
    # q_hat low word
    qhat = hi * ratio1 + tmp3 + carry2
    r = lo - qhat * q
    return jnp.where(r >= q, r - q, r)


def barrett_reduce(a, q, ratio1):
    """Reduce a < 2**64 mod q given ratio1 = floor(2**128/q) >> 64."""
    qhat = mulhi(a, ratio1)
    r = a - qhat * q
    return jnp.where(r >= q, r - q, r)


def mul_mod(a, b, q, ratio0, ratio1):
    """a*b mod q for arbitrary a,b < q (Barrett)."""
    hi, lo = mulwide(a, b)
    return barrett_reduce_wide(hi, lo, q, ratio0, ratio1)


def mul_mod_shoup(a, w, w_shoup, q):
    """a*w mod q where w is a precomputed constant with w_shoup=floor(w·2^64/q).

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


# ---------------------------------------------------------------------------
# Host-side constant precomputation (Python ints; exact).
# ---------------------------------------------------------------------------

def barrett_ratio(q: int) -> tuple[int, int]:
    """(lo, hi) words of floor(2**128 / q)."""
    r = (1 << 128) // q
    return r & 0xFFFFFFFFFFFFFFFF, r >> 64


def shoup(w: int, q: int) -> int:
    """floor(w * 2**64 / q) for w < q."""
    return (w << 64) // q
