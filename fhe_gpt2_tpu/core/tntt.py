"""Fused four-step negacyclic NTT as a Pallas TPU kernel (uint32 engine).

This is the TPU counterpart of the reference's HEXL AVX512 NTT hook
(seal-modified-3.6.6 util/intel_seal_ext.cpp + util/ntt.cpp): the hot
transform behind every multiply/key-switch/rescale. The XLA stage-loop in
core/ntt.py round-trips the whole [l, N] array through HBM once per butterfly
stage (15-16 stages at production rings — memory-bound, and the dominant cost
measured in round 1). Here one kernel program runs the complete transform for
one limb with everything resident in VMEM:

    x[R, 128]  --row-NTT-->  (R-point negacyclic DIT over sublanes)
               --twiddle-->  T[j1, n2] = psi^((2*br(j1)+1) * n2)
               --transpose-> [128, R]
               --col-DFT-->  (128-point cyclic DIF over sublanes)
               --transpose-> out[R, 128]

with N = R*128. Derivation (classic four-step, negacyclic variant): writing
n = n1*128 + n2 and k = k2*R + k1, the negacyclic transform
X[k] = sum_n x[n] psi^((2k+1)n) factors into an R-point negacyclic NTT over
n1 (since psi^128 has order 2R), a pointwise twiddle psi^((2k1+1) n2), and a
128-point cyclic DFT over n2 with omega = psi^(2R). All butterflies run along
the sublane axis (the lane axis is fully vectorized), and every stage's
twiddles broadcast from [m, 1, 1]-shaped slices — no gathers, no lane
shuffles except the two 32-bit transposes.

Output ordering is bit-exactly the ordering of core/ntt.py's stage network
(slot j holds the evaluation at psi^(2*br(j)+1)); golden tests pin equality.
The inverse kernel runs the exact algebraic inverse with N^{-1} folded into
the inverse twiddle table.

Tables (FourStep) are built host-side per modulus chain and attached to
NttTables as pytree children, so jitted programs receive them as arguments —
never as captured multi-MB HLO constants (the jit_sealed requirement).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import add_mod, sub_mod, mul_mod_shoup

C_LANES = 128
_FS_FIELDS = (
    "q", "rtw", "rtws", "irtw", "irtws",
    "T", "Ts", "Tinv", "Tinvs", "ctw", "ctws", "ictw", "ictws",
)


@dataclass(frozen=True)
class FourStep:
    """Per-limb four-step NTT constants (uint32 device arrays).

    Shapes: q [L,1,1] (whole array in SMEM, indexed by program id in-kernel;
    an SMEM read yields a true scalar, which
    Mosaic can broadcast into any vector shape); rtw/irtw [L,logR,R,1] and
    ctw/ictw [L,logC,C,1] hold PER-ROW stage twiddles (the block twiddle
    replicated across its block), so every stage multiply broadcasts a
    loaded [.., half, 1] slice along lanes only — Mosaic cannot broadcast a
    vector in sublanes and lanes at once, and it canonicalizes
    slice-of-broadcast back into exactly that; T/Tinv [L,R,128]."""

    q: jnp.ndarray
    rtw: jnp.ndarray
    rtws: jnp.ndarray
    irtw: jnp.ndarray
    irtws: jnp.ndarray
    T: jnp.ndarray
    Ts: jnp.ndarray
    Tinv: jnp.ndarray
    Tinvs: jnp.ndarray
    ctw: jnp.ndarray
    ctws: jnp.ndarray
    ictw: jnp.ndarray
    ictws: jnp.ndarray


jax.tree_util.register_pytree_node(
    FourStep,
    lambda t: (tuple(getattr(t, f) for f in _FS_FIELDS), None),
    lambda _, ch: FourStep(**dict(zip(_FS_FIELDS, ch))),
)


def _bit_reverse(x: int, bits: int) -> int:
    out = 0
    for _ in range(bits):
        out = (out << 1) | (x & 1)
        x >>= 1
    return out


def make_fourstep(moduli, psis, n: int) -> FourStep:
    """Host-exact table construction for all limbs of one chain."""
    C = C_LANES
    R = n // C
    logR = R.bit_length() - 1
    logC = C.bit_length() - 1
    two_n = 2 * n
    L = len(moduli)
    brR = np.array([_bit_reverse(i, logR) for i in range(R)], dtype=np.int64)
    n2 = np.arange(C, dtype=np.int64)
    r_idx = np.arange(R, dtype=np.int64)
    c_idx = np.arange(C, dtype=np.int64)
    # Exponent index maps are modulus-independent.
    # Row stage s: row r belongs to block b = r >> (logR-s); its twiddle is
    # roots_R[2^s + b] = psi^(C * br_logR(2^s + b)).
    rtw_e = np.zeros((logR, R), dtype=np.int64)
    for st in range(logR):
        blk = (1 << st) + (r_idx >> (logR - st))
        rtw_e[st] = (C * np.array([_bit_reverse(int(b), logR) for b in blk])) % two_n
    irtw_e = (-rtw_e) % two_n
    T_e = ((2 * brR[:, None] + 1) * n2[None, :]) % two_n        # [R, C]
    Tinv_e = (-(2 * brR[:, None] + 1) * n2[None, :]) % two_n
    # Col stage s: lane-position twiddle omega^(j * 2^s) with j = c mod half.
    ctw_e = np.zeros((logC, C), dtype=np.int64)
    for st in range(logC):
        half = C >> (st + 1)
        ctw_e[st] = (2 * R * ((c_idx % half) << st)) % two_n
    ictw_e = (-ctw_e) % two_n

    out = {f: [] for f in _FS_FIELDS}
    for q, psi in zip(moduli, psis):
        pw = np.empty(two_n, dtype=np.uint64)
        p = 1
        for e in range(two_n):
            pw[e] = p
            p = p * psi % q
        qq = np.uint64(q)
        n_inv = np.uint64(pow(n, -1, q))

        def sh(v):
            return ((v.astype(np.uint64) << np.uint64(32)) // qq)

        rtw = pw[rtw_e]
        irtw = pw[irtw_e]
        T = pw[T_e]
        Tinv = pw[Tinv_e] * n_inv % qq      # fold N^{-1} (fits u64: <2^62)
        ctw = pw[ctw_e]
        ictw = pw[ictw_e]
        out["q"].append(np.full((1, 1), q, dtype=np.uint32))
        for name, v in (("rtw", rtw), ("irtw", irtw), ("T", T),
                        ("Tinv", Tinv), ("ctw", ctw), ("ictw", ictw)):
            out[name].append(v.astype(np.uint32))
            out[name + "s"].append(sh(v).astype(np.uint32))

    def stack(name):
        a = np.stack(out[name])
        if name == "q":
            return jnp.asarray(a)                     # [L, 1, 1]
        if name.startswith(("rtw", "irtw")):
            # [L, logR*R, 1]: flattened so BlockSpec index maps stay 3-output
            return jnp.asarray(a.reshape(a.shape[0], -1)[..., None])
        if name.startswith(("ctw", "ictw")):
            return jnp.asarray(a.reshape(a.shape[0], -1)[..., None])
        return jnp.asarray(a)                         # [L, R, C]

    return FourStep(**{f: stack(f) for f in _FS_FIELDS})


def slice_fourstep(fs: FourStep, idx) -> FourStep:
    i = np.asarray(idx)

    def s(x):
        with jax.ensure_compile_time_eval():
            return jnp.asarray(np.asarray(x)[i])

    return FourStep(**{f: s(getattr(fs, f)) for f in _FS_FIELDS})


# ---------------------------------------------------------------------------
# Kernel bodies (operate on values; all butterflies along the sublane axis)
# ---------------------------------------------------------------------------

def _row_ntt_fwd(y, rtw, rtws, q):
    # rtw/rtws: [logR, R, 1] per-row stage twiddles; each stage multiply is a
    # lane-only broadcast of a loaded slice.
    R, C = y.shape
    logR = R.bit_length() - 1
    for s in range(logR):
        m = 1 << s
        half = R >> (s + 1)
        yv = y.reshape(m, 2, half, C)
        w = rtw[s].reshape(m, 2, half, 1)[:, 1]
        ws = rtws[s].reshape(m, 2, half, 1)[:, 1]
        u = yv[:, 0]
        v = mul_mod_shoup(yv[:, 1], w, ws, q)
        y = jnp.stack([add_mod(u, v, q), sub_mod(u, v, q)],
                      axis=1).reshape(R, C)
    return y


def _row_ntt_inv(y, irtw, irtws, q):
    R, C = y.shape
    logR = R.bit_length() - 1
    for s in range(logR - 1, -1, -1):
        m = 1 << s
        half = R >> (s + 1)
        yv = y.reshape(m, 2, half, C)
        w = irtw[s].reshape(m, 2, half, 1)[:, 1]
        ws = irtws[s].reshape(m, 2, half, 1)[:, 1]
        u = yv[:, 0]
        v = yv[:, 1]
        y = jnp.stack(
            [add_mod(u, v, q), mul_mod_shoup(sub_mod(u, v, q), w, ws, q)],
            axis=1).reshape(R, C)
    return y


def _col_dft_fwd(z, ctw, ctws, q):
    """Cyclic C-point DIF over the sublane axis: natural in, bit-rev out."""
    C, R = z.shape
    logC = C.bit_length() - 1
    for s in range(logC):
        blocks = 1 << s
        half = C >> (s + 1)
        zv = z.reshape(blocks, 2, half, R)
        u = zv[:, 0]
        v = zv[:, 1]
        w = ctw[s].reshape(blocks, 2, half, 1)[:, 1]
        ws = ctws[s].reshape(blocks, 2, half, 1)[:, 1]
        a = add_mod(u, v, q)
        b = mul_mod_shoup(sub_mod(u, v, q), w, ws, q)
        z = jnp.stack([a, b], axis=1).reshape(C, R)
    return z


def _col_dft_inv(z, ictw, ictws, q):
    """Exact inverse of _col_dft_fwd scaled by C (folded into Tinv)."""
    C, R = z.shape
    logC = C.bit_length() - 1
    for s in range(logC - 1, -1, -1):
        blocks = 1 << s
        half = C >> (s + 1)
        zv = z.reshape(blocks, 2, half, R)
        u = zv[:, 0]
        w = ictw[s].reshape(blocks, 2, half, 1)[:, 1]
        ws = ictws[s].reshape(blocks, 2, half, 1)[:, 1]
        v = mul_mod_shoup(zv[:, 1], w, ws, q)
        z = jnp.stack([add_mod(u, v, q), sub_mod(u, v, q)],
                      axis=1).reshape(C, R)
    return z


def _fwd_kernel(q_ref, x_ref, rtw_ref, rtws_ref, T_ref, Ts_ref,
                ctw_ref, ctws_ref, out_ref):
    q = q_ref[pl.program_id(1), 0, 0]
    y = x_ref[0, 0]                                    # [R, C]
    R = y.shape[0]
    logR = R.bit_length() - 1
    y = _row_ntt_fwd(y, rtw_ref[0].reshape(logR, R, 1),
                     rtws_ref[0].reshape(logR, R, 1), q)
    y = mul_mod_shoup(y, T_ref[0], Ts_ref[0], q)
    z = y.T                                            # [C, R]
    logC = C_LANES.bit_length() - 1
    z = _col_dft_fwd(z, ctw_ref[0].reshape(logC, C_LANES, 1),
                     ctws_ref[0].reshape(logC, C_LANES, 1), q)
    out_ref[0, 0] = z.T


def _inv_kernel(q_ref, x_ref, irtw_ref, irtws_ref, Tinv_ref, Tinvs_ref,
                ictw_ref, ictws_ref, out_ref):
    q = q_ref[pl.program_id(1), 0, 0]
    z = x_ref[0, 0].T                                  # [C, R]
    logC = C_LANES.bit_length() - 1
    z = _col_dft_inv(z, ictw_ref[0].reshape(logC, C_LANES, 1),
                     ictws_ref[0].reshape(logC, C_LANES, 1), q)
    y = z.T                                            # [R, C]
    R = y.shape[0]
    logR = R.bit_length() - 1
    y = mul_mod_shoup(y, Tinv_ref[0], Tinvs_ref[0], q)
    out_ref[0, 0] = _row_ntt_inv(y, irtw_ref[0].reshape(logR, R, 1),
                                 irtws_ref[0].reshape(logR, R, 1), q)


def _call(kernel, x, tabs, interpret: bool):
    *lead, l, n = x.shape
    R = n // C_LANES
    M = 1
    for d in lead:
        M *= d
    xr = x.reshape(M, l, R, C_LANES)
    q, t_rw, t_rws, t_T, t_Ts, t_c, t_cs = tabs
    nr = t_rw.shape[1]              # logR * R
    nc = t_c.shape[1]               # logC * C
    specs = [
        # q rides whole in SMEM (blocked SMEM specs fail Mosaic's tile
        # rules) with an explicit full-size block; the kernel indexes it with
        # program_id(1). Index-map constants are written j*0 so every output
        # is a traced i32 — literal 0s stage as i64 constants, and Mosaic
        # fails to legalize an all-i64 index-map func.return.
        pl.BlockSpec(q.shape, lambda i, j: (j * 0, j * 0, j * 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, R, C_LANES), lambda i, j: (i, j, j * 0, j * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nr, 1), lambda i, j: (j, j * 0, j * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nr, 1), lambda i, j: (j, j * 0, j * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, C_LANES), lambda i, j: (j, j * 0, j * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, C_LANES), lambda i, j: (j, j * 0, j * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nc, 1), lambda i, j: (j, j * 0, j * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nc, 1), lambda i, j: (j, j * 0, j * 0),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(M, l),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 1, R, C_LANES),
                               lambda i, j: (i, j, j * 0, j * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, l, R, C_LANES), x.dtype),
        interpret=interpret,
    )(q, xr, t_rw, t_rws, t_T, t_Ts, t_c, t_cs)
    return out.reshape(x.shape)


def fourstep_ntt(x: jnp.ndarray, fs: FourStep,
                 interpret: bool = False) -> jnp.ndarray:
    """Forward negacyclic NTT over [..., l, N]; matches core.ntt.ntt bit-exactly."""
    return _call(_fwd_kernel, x,
                 (fs.q, fs.rtw, fs.rtws, fs.T, fs.Ts, fs.ctw, fs.ctws),
                 interpret)


def fourstep_intt(x: jnp.ndarray, fs: FourStep,
                  interpret: bool = False) -> jnp.ndarray:
    """Inverse negacyclic NTT over [..., l, N]; matches core.ntt.intt bit-exactly."""
    return _call(_inv_kernel, x,
                 (fs.q, fs.irtw, fs.irtws, fs.Tinv, fs.Tinvs,
                  fs.ictw, fs.ictws),
                 interpret)
