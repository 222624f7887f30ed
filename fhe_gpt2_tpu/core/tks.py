"""Fused hybrid key-switch (decompose → NTT → MAC) as ONE Pallas kernel.

The measured keyswitch profile (README stage table) is dominated by
per-`pallas_call` and XLA-segment overhead, not arithmetic: the split path
runs iNTT [call] → base-convert digits [XLA] → NTT [call] → digit MAC [XLA],
round-tripping the [D, l+k, N] digit tensor through HBM twice. Here the
convert + forward NTT + key MAC run inside a single kernel over grid
(batch, key-limb j, digit d, source-limb a):

  scratch  += y[d, a] · punc[d, j, a]        (a innermost; base_convert_mac)
  at a=A−1: poly = fourstep_ntt(scratch)      (limb j's tables, in VMEM)
            poly = own[d, j] ? c_ntt[j] : poly   (own-limb splice)
            out[c, j] += poly · key[c, d, j]     (accumulated over d)

Semantics are bit-exactly `_decompose_core` + `_ks_mac_core`
(core/evaluator.py); golden tests pin equality. uint32 engine only
(the u64 engine has no Pallas path). Counterpart of the reference's
`switch_key_inplace` inner loop (evaluator.cpp:2281) — the loop the
reference runs per (digit × limb) on scalar words, here one resident-VMEM
program per key limb.

Mirrors mod_sum's u32 lazy bound implicitly: every accumulation is an
add_mod chain (values stay < q), identical to base_convert_mac / the
group=2 fold.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import add_mod, mul_mod, mul_mod_shoup, sub_mod
from .tntt import C_LANES, _row_ntt_fwd, _col_dft_fwd

_TK_LEAVES = ("q3", "r0_3", "r1_3", "own", "pw", "gather", "inv_punc",
              "inv_punc_shoup", "src_q")


@dataclass(frozen=True)
class FusedKsTables:
    """Host-built constants for one (level → key basis) fused key switch."""

    q3: jnp.ndarray          # [J,1,1] uint32 dst moduli (SMEM)
    r0_3: jnp.ndarray        # [J,1,1] barrett lo
    r1_3: jnp.ndarray        # [J,1,1] barrett hi
    own: jnp.ndarray         # [D,J]   int32 own-limb splice mask (SMEM)
    pw: jnp.ndarray          # [D,J,A] uint32 punc_mod_dst, zero-padded (SMEM)
    gather: jnp.ndarray      # [D*A]   int32 src limb index per (d,a), pad→0
    inv_punc: jnp.ndarray    # [D,A,1] uint32 (pad rows 0)
    inv_punc_shoup: jnp.ndarray
    src_q: jnp.ndarray       # [D,A,1] uint32 (pad rows 1)
    D: int = 0
    A: int = 0


jax.tree_util.register_pytree_node(
    FusedKsTables,
    lambda t: (tuple(getattr(t, f) for f in _TK_LEAVES), (t.D, t.A)),
    lambda aux, ch: FusedKsTables(**dict(zip(_TK_LEAVES, ch)),
                                  D=aux[0], A=aux[1]),
)


def make_fused_ks_tables(ctx, level: int) -> FusedKsTables:
    """Build from the context's digit structure (digit_groups/decomp_tables)."""
    groups = ctx.digit_groups(level)
    bcts = ctx.decomp_tables(level)
    key_limbs = ctx.key_limbs(level)
    J = len(key_limbs)
    D = len(groups)
    A = max(len(g) for g in groups)
    own = np.zeros((D, J), dtype=np.int32)
    pw = np.zeros((D, J, A), dtype=np.uint32)
    gather = np.zeros((D, A), dtype=np.int32)
    ipunc = np.zeros((D, A, 1), dtype=np.uint32)
    ipunc_sh = np.zeros((D, A, 1), dtype=np.uint32)
    srcq = np.ones((D, A, 1), dtype=np.uint32)
    for d, g in enumerate(groups):
        own[d, list(g)] = 1
        bct = bcts[d]
        w = len(g)
        pw[d, :, :w] = np.asarray(bct.punc_mod_dst).T        # [J, w]
        gather[d, :w] = np.asarray(g, dtype=np.int32)
        ipunc[d, :w, 0] = np.asarray(bct.inv_punc).ravel()
        ipunc_sh[d, :w, 0] = np.asarray(bct.inv_punc_shoup).ravel()
        srcq[d, :w, 0] = np.asarray(bct.src_q).ravel()
    kt = ctx.tables(key_limbs)
    with jax.ensure_compile_time_eval():
        return FusedKsTables(
            q3=jnp.asarray(np.asarray(kt.q).reshape(J, 1, 1)),
            r0_3=jnp.asarray(np.asarray(kt.ratio0).reshape(J, 1, 1)),
            r1_3=jnp.asarray(np.asarray(kt.ratio1).reshape(J, 1, 1)),
            own=jnp.asarray(own), pw=jnp.asarray(pw),
            gather=jnp.asarray(gather.ravel()),
            inv_punc=jnp.asarray(ipunc), inv_punc_shoup=jnp.asarray(ipunc_sh),
            src_q=jnp.asarray(srcq), D=D, A=A)


_MD_LEAVES = ("q3", "r0_3", "r1_3", "punc", "pinvf", "pmodq", "halfq",
              "invp", "invps", "half_p", "inv_punc", "inv_punc_shoup",
              "src_q")


@dataclass(frozen=True)
class FusedMdTables:
    """Constants for the fused mod-down / composite-rescale kernel: divide
    NTT-form x[..., l+k, N] by P = prod of the k trailing primes."""

    q3: jnp.ndarray          # [l,1,1] dst moduli (SMEM)
    r0_3: jnp.ndarray
    r1_3: jnp.ndarray
    punc: jnp.ndarray        # [k,l]   (P/p_i) mod q_j (SMEM)
    pinvf: jnp.ndarray       # [k,1,1] float32 1/p_i (SMEM)
    pmodq: jnp.ndarray       # [l,1,1] P mod q_j (SMEM)
    halfq: jnp.ndarray       # [l,1,1] (P>>1) mod q_j (SMEM)
    invp: jnp.ndarray        # [l,1,1] P^{-1} mod q_j (SMEM)
    invps: jnp.ndarray       # [l,1,1] shoup
    half_p: jnp.ndarray      # [k,1] (P>>1) mod p_i  (XLA preproc)
    inv_punc: jnp.ndarray    # [k,1]  [(P/p_i)^{-1}]_{p_i} (XLA preproc)
    inv_punc_shoup: jnp.ndarray
    src_q: jnp.ndarray       # [k,1]


jax.tree_util.register_pytree_node(
    FusedMdTables,
    lambda t: (tuple(getattr(t, f) for f in _MD_LEAVES), None),
    lambda _, ch: FusedMdTables(**dict(zip(_MD_LEAVES, ch))),
)


def make_fused_md_tables(mdt, kt) -> FusedMdTables:
    """From rns.ModDownTables (mdt) + the destination NttTables (kt, sliced
    to the l output limbs)."""
    l = np.asarray(mdt.inv_p).shape[0]
    k = np.asarray(mdt.half_p).shape[0]

    def col3(v):
        return jnp.asarray(np.asarray(v).reshape(-1, 1, 1))

    with jax.ensure_compile_time_eval():
        return FusedMdTables(
            q3=col3(kt.q), r0_3=col3(kt.ratio0), r1_3=col3(kt.ratio1),
            punc=jnp.asarray(np.asarray(mdt.bct.punc_mod_dst)),   # [k, l]
            pinvf=jnp.asarray(
                np.asarray(mdt.p_invf).reshape(-1, 1, 1)),
            pmodq=col3(mdt.p_mod_q), halfq=col3(mdt.half_q),
            invp=col3(mdt.inv_p), invps=col3(mdt.inv_p_shoup),
            half_p=mdt.half_p, inv_punc=mdt.bct.inv_punc,
            inv_punc_shoup=mdt.bct.inv_punc_shoup, src_q=mdt.bct.src_q)


def _md_kernel(q_ref, r0_ref, r1_ref, punc_ref, pinvf_ref, pmodq_ref,
               halfq_ref, invp_ref, invps_ref, x_ref, v_ref,
               rtw_ref, rtws_ref, T_ref, Ts_ref, ctw_ref, ctws_ref,
               out_ref):
    j = pl.program_id(1)
    q = q_ref[j, 0, 0]
    r0 = r0_ref[j, 0, 0]
    r1 = r1_ref[j, 0, 0]
    k = v_ref.shape[1]
    acc = None
    f = None
    for i in range(k):                      # static unroll over drop limbs
        vi = v_ref[0, i]                    # [R, C]
        t = mul_mod(vi, punc_ref[i, j], q, r0, r1)
        acc = t if acc is None else add_mod(acc, t, q)
        # Mosaic has no uint32→float32 cast; go via int32 (values < 2^31,
        # so the reinterpret is value-preserving on the u32 engine).
        fi = vi.astype(jnp.int32).astype(jnp.float32) * pinvf_ref[i, 0, 0]
        f = fi if f is None else f + fi
    # HPS overflow unit (rns.mod_down_convert semantics incl. the clamp).
    # float32→uint32 is likewise unsupported; clamp keeps u in int32 range.
    u = jnp.clip(jnp.floor(f), 0.0, float(k - 1)).astype(
        jnp.int32).astype(acc.dtype)
    img = sub_mod(acc, mul_mod(u, pmodq_ref[j, 0, 0], q, r0, r1), q)
    img = sub_mod(img, halfq_ref[j, 0, 0], q)
    R = img.shape[0]
    logR = R.bit_length() - 1
    logC = C_LANES.bit_length() - 1
    y = _row_ntt_fwd(img, rtw_ref[0].reshape(logR, R, 1),
                     rtws_ref[0].reshape(logR, R, 1), q)
    y = mul_mod_shoup(y, T_ref[0], Ts_ref[0], q)
    z = _col_dft_fwd(y.T, ctw_ref[0].reshape(logC, C_LANES, 1),
                     ctws_ref[0].reshape(logC, C_LANES, 1), q)
    diff = sub_mod(x_ref[0, 0], z.T, q)
    out_ref[0, 0] = mul_mod_shoup(diff, invp_ref[j, 0, 0],
                                  invps_ref[j, 0, 0], q)


def fused_mod_down(x: jnp.ndarray, t_sp, t_q, ft: FusedMdTables,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused one-shot divide-and-round of NTT-form x[..., l+k, N] by
    P = prod of the k trailing primes: iNTT of the k drop limbs (its own
    fused kernel), then ONE kernel doing base-convert + overflow correction
    + forward NTT + subtract + ·P⁻¹ per output limb. Bit-exact
    `_mod_down_core` (core/evaluator.py)."""
    from . import ntt as nttmod
    *lead, lk, n = x.shape
    k = ft.half_p.shape[0]
    l = lk - k
    R = n // C_LANES
    M = 1
    for dim in lead:
        M *= dim
    fs = t_q.fs
    a = nttmod._intt(x[..., l:, :], t_sp)
    v = mul_mod_shoup(add_mod(a, ft.half_p, ft.src_q),
                      ft.inv_punc, ft.inv_punc_shoup, ft.src_q)
    vr = v.reshape(M, k, R, C_LANES)
    xr = x[..., :l, :].reshape(M, l, R, C_LANES)
    nr = fs.rtw.shape[1]
    nc = fs.ctw.shape[1]
    smem = pltpu.SMEM
    vmem = pltpu.VMEM
    z = lambda v_: v_ * 0

    def whole(shape, space=smem):
        return pl.BlockSpec(shape, lambda m, j: (z(j),) * len(shape),
                            memory_space=space)

    specs = [
        whole(ft.q3.shape), whole(ft.q3.shape), whole(ft.q3.shape),
        whole(ft.punc.shape), whole(ft.pinvf.shape), whole(ft.pmodq.shape),
        whole(ft.halfq.shape), whole(ft.invp.shape), whole(ft.invps.shape),
        pl.BlockSpec((1, 1, R, C_LANES), lambda m, j: (m, j, z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((1, k, R, C_LANES), lambda m, j: (m, z(j), z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((1, nr, 1), lambda m, j: (j, z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((1, nr, 1), lambda m, j: (j, z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((1, R, C_LANES), lambda m, j: (j, z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((1, R, C_LANES), lambda m, j: (j, z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((1, nc, 1), lambda m, j: (j, z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((1, nc, 1), lambda m, j: (j, z(j), z(j)),
                     memory_space=vmem),
    ]
    out = pl.pallas_call(
        _md_kernel,
        grid=(M, l),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 1, R, C_LANES),
                               lambda m, j: (m, j, z(j), z(j)),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((M, l, R, C_LANES), x.dtype),
        interpret=interpret,
    )(ft.q3, ft.r0_3, ft.r1_3, ft.punc, ft.pinvf, ft.pmodq, ft.halfq,
      ft.invp, ft.invps, xr, vr,
      fs.rtw, fs.rtws, fs.T, fs.Ts, fs.ctw, fs.ctws)
    return out.reshape(*lead, l, n)


def _ks_kernel(q_ref, r0_ref, r1_ref, own_ref, pw_ref,
               cntt_ref, y_ref, k_ref,
               rtw_ref, rtws_ref, T_ref, Ts_ref, ctw_ref, ctws_ref,
               out_ref, scratch):
    j = pl.program_id(1)
    d = pl.program_id(2)
    a = pl.program_id(3)
    A = pl.num_programs(3)
    q = q_ref[j, 0, 0]
    r0 = r0_ref[j, 0, 0]
    r1 = r1_ref[j, 0, 0]
    # Base-conversion MAC term for source slot a of digit d (zero rows for
    # the padded tail: pw is 0 there).
    term = mul_mod(y_ref[0, 0, 0], pw_ref[d, j, a], q, r0, r1)
    acc = jnp.where(a == 0, term, add_mod(scratch[...], term, q))
    scratch[...] = acc

    @pl.when(a == A - 1)
    def _():
        y = acc
        R = y.shape[0]
        logR = R.bit_length() - 1
        logC = C_LANES.bit_length() - 1
        y = _row_ntt_fwd(y, rtw_ref[0].reshape(logR, R, 1),
                         rtws_ref[0].reshape(logR, R, 1), q)
        y = mul_mod_shoup(y, T_ref[0], Ts_ref[0], q)
        z = _col_dft_fwd(y.T, ctw_ref[0].reshape(logC, C_LANES, 1),
                         ctws_ref[0].reshape(logC, C_LANES, 1), q)
        poly = z.T
        # Own-limb splice: on a digit's own data limbs the conversion is
        # exact and the ORIGINAL NTT form is reused (skips the round trip).
        poly = jnp.where(own_ref[d, j] != 0, cntt_ref[0, 0], poly)
        first = d == 0
        for c in range(2):
            contrib = mul_mod(poly, k_ref[c, 0, 0], q, r0, r1)
            prev = out_ref[c, 0, 0]
            out_ref[c, 0, 0] = jnp.where(first, contrib,
                                         add_mod(prev, contrib, q))


def fused_switch_key(c_ntt: jnp.ndarray, kdata: jnp.ndarray,
                     lt, kt, ft: FusedKsTables,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused decompose+NTT+MAC key switch.

    c_ntt:  uint32[*B, l, N] NTT form.
    kdata:  uint32[2, D, J, N] active key digits/limbs (Evaluator._slice_key).
    lt/kt:  NttTables at the data level resp. key basis (kt.fs required).
    Returns uint32[2, *B, J, N] — bit-exact `_ks_mac_core(_decompose_core)`.
    """
    from . import ntt as nttmod
    *lead, l, n = c_ntt.shape
    R = n // C_LANES
    M = 1
    for dim in lead:
        M *= dim
    D, A = ft.D, ft.A
    J = kdata.shape[2]
    fs = kt.fs
    # Host-side half: iNTT (its own fused kernel) + per-digit y operands.
    c_coeff = nttmod._intt(c_ntt, lt)                       # [*B, l, N]
    g = jnp.take(c_coeff, ft.gather, axis=-2)               # [*B, D*A, N]
    g = g.reshape(*lead, D, A, n)
    y = mul_mod_shoup(g, ft.inv_punc, ft.inv_punc_shoup, ft.src_q)
    y = y.reshape(M, D, A, R, C_LANES)
    cr = c_ntt.reshape(M, l, R, C_LANES)
    kr = kdata.reshape(2, D, J, R, C_LANES)
    nr = fs.rtw.shape[1]
    nc = fs.ctw.shape[1]
    lm1 = l - 1
    smem = pltpu.SMEM
    vmem = pltpu.VMEM
    z = lambda v: v * 0
    specs = [
        pl.BlockSpec(ft.q3.shape, lambda m, j, d, a: (z(j), z(j), z(j)),
                     memory_space=smem),
        pl.BlockSpec(ft.q3.shape, lambda m, j, d, a: (z(j), z(j), z(j)),
                     memory_space=smem),
        pl.BlockSpec(ft.q3.shape, lambda m, j, d, a: (z(j), z(j), z(j)),
                     memory_space=smem),
        pl.BlockSpec(ft.own.shape, lambda m, j, d, a: (z(j), z(j)),
                     memory_space=smem),
        pl.BlockSpec(ft.pw.shape, lambda m, j, d, a: (z(j), z(j), z(j)),
                     memory_space=smem),
        # c_ntt limb j (clamped for the special limbs, where own is 0 and
        # the loaded block is discarded by the splice select).
        pl.BlockSpec((1, 1, R, C_LANES),
                     lambda m, j, d, a: (m, jnp.minimum(j, lm1), z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((1, 1, 1, R, C_LANES),
                     lambda m, j, d, a: (m, d, a, z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((2, 1, 1, R, C_LANES),
                     lambda m, j, d, a: (z(j), d, j, z(j), z(j)),
                     memory_space=vmem),
        # Four-step tables for key limb j (same layout as tntt._call).
        pl.BlockSpec((1, nr, 1), lambda m, j, d, a: (j, z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((1, nr, 1), lambda m, j, d, a: (j, z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((1, R, C_LANES), lambda m, j, d, a: (j, z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((1, R, C_LANES), lambda m, j, d, a: (j, z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((1, nc, 1), lambda m, j, d, a: (j, z(j), z(j)),
                     memory_space=vmem),
        pl.BlockSpec((1, nc, 1), lambda m, j, d, a: (j, z(j), z(j)),
                     memory_space=vmem),
    ]
    out = pl.pallas_call(
        _ks_kernel,
        grid=(M, J, D, A),
        in_specs=specs,
        out_specs=pl.BlockSpec((2, 1, 1, R, C_LANES),
                               lambda m, j, d, a: (z(j), m, j, z(j), z(j)),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((2, M, J, R, C_LANES), c_ntt.dtype),
        scratch_shapes=[pltpu.VMEM((R, C_LANES), jnp.uint32)],
        interpret=interpret,
    )(ft.q3, ft.r0_3, ft.r1_3, ft.own, ft.pw, cr, y, kr,
      fs.rtw, fs.rtws, fs.T, fs.Ts, fs.ctw, fs.ctws)
    return out.reshape(2, *lead, J, n)
