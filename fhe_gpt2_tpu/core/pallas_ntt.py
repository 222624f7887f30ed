"""Fused negacyclic NTT as a Pallas TPU kernel (u32-pair arithmetic).

The XLA path (core/ntt.py) materializes each of the log2(N) butterfly stages
through HBM; this kernel keeps the whole transform resident in VMEM — one
read, one write — with 64-bit modular arithmetic hand-built on u32 lanes.

Mosaic supports no general shape casts, so stages are expressed reshape-free:
the poly lives as [R, 128]; a stage with butterfly distance `half` pairs
elements via a roll along the sublane axis (half ≥ 128) or the lane axis
(half < 128) plus u/v masks from broadcasted iota:

    t   = x·w                (Shoup, everywhere; meaningful at v positions)
    u'  = x + roll(t, -half)   at u positions
    v'  = roll(x, +half) - t   at v positions

Per-stage per-element twiddle tables are precomputed host-side
([logn, R, 128] per word), which bounds this kernel to n ≤ ~8192 for
VMEM-resident tables; larger rings stream tables per stage (round 2).
Golden-tested against the XLA path in tests/test_pallas_ntt.py.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U16 = 16
M16 = 0xFFFF

LANES = 128


# ---------------------------------------------------------------------------
# u32-pair arithmetic (values are (lo, hi) u32 pairs)
# ---------------------------------------------------------------------------

def _mul32_wide(a, b):
    al, ah = a & M16, a >> U16
    bl, bh = b & M16, b >> U16
    t = al * bl
    t1 = ah * bl + (t >> U16)
    t2 = al * bh + (t1 & M16)
    hi = ah * bh + (t1 >> U16) + (t2 >> U16)
    return a * b, hi


def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (lo < alo).astype(jnp.uint32)
    return lo, ahi + bhi + carry


def _sub64(alo, ahi, blo, bhi):
    lo = alo - blo
    borrow = (alo < blo).astype(jnp.uint32)
    return lo, ahi - bhi - borrow


def _ge64(alo, ahi, blo, bhi):
    return (ahi > bhi) | ((ahi == bhi) & (alo >= blo))


def _mullo64(alo, ahi, blo, bhi):
    lo, c = _mul32_wide(alo, blo)
    return lo, c + alo * bhi + ahi * blo


def _mulhi64(alo, ahi, blo, bhi):
    ll_lo, ll_hi = _mul32_wide(alo, blo)
    lh_lo, lh_hi = _mul32_wide(alo, bhi)
    hl_lo, hl_hi = _mul32_wide(ahi, blo)
    hh_lo, hh_hi = _mul32_wide(ahi, bhi)
    m1 = ll_hi + lh_lo
    c1 = (m1 < ll_hi).astype(jnp.uint32)
    m2 = m1 + hl_lo
    c2 = (m2 < m1).astype(jnp.uint32)
    zero = jnp.zeros_like(hh_hi)
    lo, hi = _add64(hh_lo, hh_hi, lh_hi, zero)
    lo, hi = _add64(lo, hi, hl_hi, zero)
    lo, hi = _add64(lo, hi, c1 + c2, zero)
    return lo, hi


def _add_mod(alo, ahi, blo, bhi, qlo, qhi):
    slo, shi = _add64(alo, ahi, blo, bhi)
    ge = _ge64(slo, shi, qlo, qhi)
    rlo, rhi = _sub64(slo, shi, qlo, qhi)
    return jnp.where(ge, rlo, slo), jnp.where(ge, rhi, shi)


def _sub_mod(alo, ahi, blo, bhi, qlo, qhi):
    ge = _ge64(alo, ahi, blo, bhi)
    d1lo, d1hi = _sub64(alo, ahi, blo, bhi)
    tlo, thi = _add64(alo, ahi, qlo, qhi)
    d2lo, d2hi = _sub64(tlo, thi, blo, bhi)
    return jnp.where(ge, d1lo, d2lo), jnp.where(ge, d1hi, d2hi)


def _mul_mod_shoup(alo, ahi, wlo, whi, wslo, wshi, qlo, qhi):
    qh_lo, qh_hi = _mulhi64(alo, ahi, wslo, wshi)
    aw_lo, aw_hi = _mullo64(alo, ahi, wlo, whi)
    qq_lo, qq_hi = _mullo64(qh_lo, qh_hi, qlo, qhi)
    rlo, rhi = _sub64(aw_lo, aw_hi, qq_lo, qq_hi)
    ge = _ge64(rlo, rhi, qlo, qhi)
    slo, shi = _sub64(rlo, rhi, qlo, qhi)
    return jnp.where(ge, slo, rlo), jnp.where(ge, shi, rhi)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _ntt_kernel(logn, inverse,
                xlo_ref, xhi_ref, wlo_ref, whi_ref, wslo_ref, wshi_ref,
                umask_ref, q_ref, olo_ref, ohi_ref):
    n = 1 << logn
    R = max(1, n // LANES)
    cols = min(n, LANES)
    li = pl.program_id(0)
    qlo = q_ref[li, 0]
    qhi = q_ref[li, 1]
    xlo = xlo_ref[0]
    xhi = xhi_ref[0]
    stages = range(logn) if not inverse else range(logn - 1, -1, -1)
    for s in stages:
        half = n >> (s + 1)
        wl = wlo_ref[0, s]
        wh = whi_ref[0, s]
        wsl = wslo_ref[0, s]
        wsh = wshi_ref[0, s]
        u_mask = umask_ref[s] != 0
        if half >= cols:
            hr = half // cols
            axis, shift, size = 0, hr, R
        else:
            axis, shift, size = 1, half, cols
        # x64 mode makes Python ints i64; tpu.dynamic_rotate wants i32.
        nshift = jnp.int32((size - shift) % size)
        shift = jnp.int32(shift)
        if not inverse:
            tlo, thi = _mul_mod_shoup(xlo, xhi, wl, wh, wsl, wsh, qlo, qhi)
            tl_lo = pltpu.roll(tlo, nshift, axis=axis)
            tl_hi = pltpu.roll(thi, nshift, axis=axis)
            xr_lo = pltpu.roll(xlo, shift, axis=axis)
            xr_hi = pltpu.roll(xhi, shift, axis=axis)
            ulo, uhi = _add_mod(xlo, xhi, tl_lo, tl_hi, qlo, qhi)
            vlo, vhi = _sub_mod(xr_lo, xr_hi, tlo, thi, qlo, qhi)
        else:
            xl_lo = pltpu.roll(xlo, nshift, axis=axis)
            xl_hi = pltpu.roll(xhi, nshift, axis=axis)
            xr_lo = pltpu.roll(xlo, shift, axis=axis)
            xr_hi = pltpu.roll(xhi, shift, axis=axis)
            ulo, uhi = _add_mod(xlo, xhi, xl_lo, xl_hi, qlo, qhi)
            dlo, dhi = _sub_mod(xr_lo, xr_hi, xlo, xhi, qlo, qhi)
            vlo, vhi = _mul_mod_shoup(dlo, dhi, wl, wh, wsl, wsh, qlo, qhi)
        xlo = jnp.where(u_mask, ulo, vlo)
        xhi = jnp.where(u_mask, uhi, vhi)
    if inverse:
        nv_lo, nv_hi = q_ref[li, 2], q_ref[li, 3]
        nvs_lo, nvs_hi = q_ref[li, 4], q_ref[li, 5]
        xlo, xhi = _mul_mod_shoup(xlo, xhi, nv_lo, nv_hi, nvs_lo, nvs_hi,
                                  qlo, qhi)
    olo_ref[0] = xlo
    ohi_ref[0] = xhi


# ---------------------------------------------------------------------------
# Host-side table prep
# ---------------------------------------------------------------------------

def _split_np(x):
    x = np.asarray(x, dtype=np.uint64)
    return (x & np.uint64(0xFFFFFFFF)).astype(np.uint32), \
        (x >> np.uint64(32)).astype(np.uint32)


_TABLE_CACHE: dict = {}


def _key_of(t):
    k = (t.n,) + tuple(t.moduli)
    _TABLE_CACHE[k] = t
    return k


@lru_cache(maxsize=16)
def _stage_tables(tables_key):
    """Per-stage per-element twiddles [L, logn, R, cols] ×2 words per table,
    for forward and inverse, plus packed scalar constants [L, 6]."""
    t = _TABLE_CACHE[tables_key]
    n, logn = t.n, t.logn
    L = len(t.moduli)
    R = max(1, n // LANES)
    cols = min(n, LANES)

    def expand(tab):
        out = np.zeros((L, logn, n), dtype=np.uint64)
        tabn = np.asarray(tab)
        for s in range(logn):
            m = 1 << s
            half = n >> (s + 1)
            block = np.arange(n) // (2 * half)
            out[:, s, :] = tabn[:, m + block]
        return out.reshape(L, logn, R, cols)

    # Per-stage u-position masks (u = first half of each butterfly block).
    umask = np.zeros((logn, n), dtype=np.uint32)
    idx = np.arange(n)
    for st in range(logn):
        half = n >> (st + 1)
        umask[st] = ((idx % (2 * half)) < half).astype(np.uint32)
    umask = jnp.asarray(umask.reshape(logn, R, cols))
    packs = {}
    for inv, w_tab, ws_tab in (
        (False, t.roots, t.roots_shoup),
        (True, t.inv_roots, t.inv_roots_shoup),
    ):
        wlo, whi = _split_np(expand(w_tab))
        wslo, wshi = _split_np(expand(ws_tab))
        packs[inv] = tuple(jnp.asarray(a) for a in (wlo, whi, wslo, wshi))
    qlo, qhi = _split_np(np.asarray(t.q[:, 0]))
    nlo, nhi = _split_np(np.asarray(t.n_inv[:, 0]))
    nslo, nshi = _split_np(np.asarray(t.n_inv_shoup[:, 0]))
    consts = jnp.asarray(np.stack([qlo, qhi, nlo, nhi, nslo, nshi], axis=1))
    return packs, umask, consts


@partial(jax.jit, static_argnums=(8, 9))
def _run(xlo, xhi, wlo, whi, wslo, wshi, umask, consts, logn, inverse):
    L, R, cols = xlo.shape
    kernel = partial(_ntt_kernel, logn, inverse)
    bsx = pl.BlockSpec((1, R, cols), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    bsw = pl.BlockSpec((1, logn, R, cols), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    bsm = pl.BlockSpec((logn, R, cols), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[bsx, bsx, bsw, bsw, bsw, bsw, bsm,
                  pl.BlockSpec((L, 6), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(bsx, bsx),
        out_shape=(jax.ShapeDtypeStruct((L, R, cols), jnp.uint32),
                   jax.ShapeDtypeStruct((L, R, cols), jnp.uint32)),
    )(xlo, xhi, wlo, whi, wslo, wshi, umask, consts)


def _apply(x, t, inverse):
    L, n = x.shape
    R = max(1, n // LANES)
    cols = min(n, LANES)
    packs, umask, consts = _stage_tables(_key_of(t))
    wlo, whi, wslo, wshi = packs[inverse]
    lo = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).reshape(L, R, cols)
    hi = (x >> jnp.uint64(32)).astype(jnp.uint32).reshape(L, R, cols)
    olo, ohi = _run(lo, hi, wlo, whi, wslo, wshi, umask, consts, t.logn,
                    inverse)
    out = olo.astype(jnp.uint64) | (ohi.astype(jnp.uint64) << jnp.uint64(32))
    return out.reshape(L, n)


def ntt_pallas(x: jnp.ndarray, t) -> jnp.ndarray:
    """Forward negacyclic NTT via the fused Pallas kernel. x: [L, N]."""
    return _apply(x, t, False)


def intt_pallas(x: jnp.ndarray, t) -> jnp.ndarray:
    return _apply(x, t, True)


def enabled() -> bool:
    return os.environ.get("FHE_GPT2_TPU_PALLAS_NTT", "0") == "1"
