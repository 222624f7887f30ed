"""Golden tests: the fused decompose+NTT+MAC key-switch kernel (core/tks.py)
must be bit-exact against the split `_decompose_core` + `_ks_mac_core` path
(core/evaluator.py), on both the single-prime w32 chain and the composite
chain, including batched ciphertexts.

Runs in Pallas interpret mode on the CPU test host (same discipline as
test_pallas_ntt.py); on TPU the kernel is opt-in via FHE_FUSED_KS=1 until
profiled.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_gpt2_tpu.core import tks
from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
from fhe_gpt2_tpu.core.evaluator import (
    Decryptor, Encryptor, Evaluator, _decompose_core, _ks_mac_core,
)
from fhe_gpt2_tpu.core.keys import KeyGenerator


def _setup(composite=False, logn=11, levels=6, nsp=2):
    if composite:
        params = CkksParams.create_composite(
            logn=logn, num_levels=levels, log_special=31, num_special=nsp,
            hamming_weight=16)
    else:
        params = CkksParams.create(
            logn=logn, log_q0=29, log_scale=25, num_levels=levels,
            log_special=31, num_special=nsp, hamming_weight=16)
    ctx = CkksContext(params)
    assert ctx.ntt_all.fs is not None, "needs the four-step tables (N>=2048)"
    kg = KeyGenerator(ctx, seed=3)
    return ctx, kg


def _compare(ctx, kg, level, batch=()):
    rng = np.random.default_rng(0)
    n = ctx.n
    c = np.stack([
        np.stack([rng.integers(0, ctx.moduli[i], n).astype(np.uint64)
                  .astype(ctx.word) for i in range(level)])
        for _ in range(int(np.prod(batch)) if batch else 1)
    ]).reshape(*batch, level, n)
    c = jnp.asarray(c)
    ev = Evaluator(ctx)
    kt, bcts, own, D = ev._ks_structs(level)
    ksk = kg.relin_key()
    kd = ev._slice_key(ksk, level, D)
    tpoly = _decompose_core(c, kt, ctx.tables(level), bcts, own)
    ref = np.asarray(_ks_mac_core(tpoly, kd, kt))
    got = np.asarray(tks.fused_switch_key(
        c, kd, ctx.tables(level), kt, ctx.fused_ks_tables(level),
        interpret=True))
    assert got.shape == ref.shape
    assert np.array_equal(ref, got)


def test_fused_ks_bit_exact_w32():
    ctx, kg = _setup()
    _compare(ctx, kg, ctx.L)            # full level: last digit is short
    _compare(ctx, kg, 3)                # partial level


def test_fused_ks_bit_exact_composite():
    ctx, kg = _setup(composite=True, levels=4, nsp=3)
    _compare(ctx, kg, ctx.L)
    _compare(ctx, kg, 5)


def test_fused_ks_bit_exact_batched():
    ctx, kg = _setup()
    _compare(ctx, kg, 4, batch=(3,))


def test_fused_mod_down_bit_exact():
    """Fused convert+NTT+correct mod-down vs _mod_down_core: exact on every
    coefficient except possibly ±1 units where the float32 overflow
    estimator sits on a floor boundary (both roundings are within the HPS
    ≤k-unit spec; the summation order differs between jnp.sum and the
    kernel's sequential adds)."""
    from fhe_gpt2_tpu.core.evaluator import _mod_down_core

    for composite in (False, True):
        ctx, kg = _setup(composite=composite, levels=4, nsp=3)
        level = ctx.L
        rng = np.random.default_rng(2)
        n = ctx.n
        lk = level + ctx.k_sp
        mods = ctx.all_moduli[:level] + ctx.special
        x = jnp.asarray(np.stack(
            [rng.integers(0, q, n).astype(np.uint64).astype(ctx.word)
             for q in mods]))
        sp_idx = tuple(ctx.L + i for i in range(ctx.k_sp))
        ref = np.asarray(_mod_down_core(
            x, ctx.tables(sp_idx), ctx.tables(level),
            ctx.mod_down_onestep_tables(level)))
        from fhe_gpt2_tpu.core import tks as tks_mod
        got = np.asarray(tks_mod.fused_mod_down(
            x, ctx.tables(sp_idx), ctx.tables(level),
            ctx.fused_md_tables(level), interpret=True))
        assert got.shape == ref.shape
        if not np.array_equal(ref, got):
            # Residue-wise |Δ| must stay ≤ 1·inv_p-image unit: compare the
            # underlying integers via centered difference per limb.
            for row, q in enumerate(mods[:level]):
                d = (got[row].astype(np.int64) - ref[row].astype(np.int64))
                d = (d + q // 2) % q - q // 2
                # ±1 unit of P^{-1}: difference is ±inv_p mod q
                inv_p = int(np.asarray(
                    ctx.mod_down_onestep_tables(level).inv_p)[row, 0])
                ok = np.isin(np.abs(d), [0, inv_p, q - inv_p])
                assert ok.all(), (row, d[~ok][:5])


def test_fused_ks_end_to_end_rotation():
    """Whole-evaluator path with FHE_FUSED_KS=1: rotate + relin decrypt
    correctly through the fused kernel."""
    import os
    os.environ["FHE_FUSED_KS"] = "1"
    os.environ["FHE_PALLAS_INTERPRET"] = "1"
    try:
        ctx, kg = _setup()
        ev = Evaluator(ctx, relin_key=kg.relin_key(),
                       galois_keys=kg.galois_keys(steps=[1, 5],
                                                  conjugate=True))
        enc = Encryptor(ctx, secret=kg.secret, seed=4)
        dec = Decryptor(ctx, kg.secret)
        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, ctx.params.slots)
        ct = enc.encrypt(ev.make_plain(x, ctx.params.scale, ctx.L))
        out = ev.rescale(ev.multiply(ct, ct))
        assert np.max(np.abs(dec.decrypt(out) - x * x)) < 1e-4
        rot = ev.rotate(ct, 5)
        assert np.max(np.abs(dec.decrypt(rot) - np.roll(x, -5))) < 1e-4
    finally:
        os.environ.pop("FHE_FUSED_KS", None)
        os.environ.pop("FHE_PALLAS_INTERPRET", None)
