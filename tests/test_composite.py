"""Composite two-prime scaling (uint32 engine at u64-grade precision).

Each logical level is a PAIR of <2**31 NTT primes with product ≈ Δ = 2**50;
the bootstrap base is a pair with product Q0 ≈ 2**55. Rescale drops a pair;
ModRaise Garner-combines the two base limbs. This closes the measured w32
single-prime bootstrap noise floor (Δ=2**25 grain amplified ~10³ through
EvalMod — see README): the composite engine's full-bootstrap error below
matches the u64 engine at the identical ring (~1e-4), not the w32 floor
(~1.4e-2).

Reference counterpart: the 32-bit-word composite-scaling regime has no
reference implementation (the reference is u64-only, infer_seal.cpp:287);
semantics validated against this framework's own u64 engine.
"""

import math

import numpy as np
import pytest

from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
from fhe_gpt2_tpu.core.evaluator import Decryptor, Encryptor, Evaluator
from fhe_gpt2_tpu.core.keys import KeyGenerator

NS = 64


def _setup(levels=6, logn=10, sparse=0):
    params = CkksParams.create_composite(
        logn=logn, num_levels=levels, log_scale=50, log_q0=55,
        log_special=31, num_special=2, hamming_weight=16, sparse_slots=sparse)
    ctx = CkksContext(params)
    kg = KeyGenerator(ctx, seed=3)
    ev = Evaluator(ctx, relin_key=kg.relin_key(),
                   galois_keys=kg.galois_keys(steps=[1, 7], conjugate=True))
    return params, ctx, kg, ev, Encryptor(ctx, secret=kg.secret, seed=4), \
        Decryptor(ctx, kg.secret)


def test_composite_chain_geometry():
    params, ctx, *_ = _setup()
    assert ctx.word_bits == 32 and ctx.rescale_limbs == 2 \
        and ctx.base_limbs == 2
    # Pair products hug the targets.
    assert abs(math.log2(ctx.q0_int) - 55) < 0.01
    for i in range(2, ctx.L, 2):
        pair = math.log2(ctx.moduli[i] * ctx.moduli[i + 1])
        assert abs(pair - 50) < 0.01, (i, pair)
    assert abs(math.log2(ctx.rescale_divisor(ctx.L)) - 50) < 0.01


def test_composite_mult_precision_u64_grade():
    """mul+rescale / rotate / conjugate at Δ=2**50 on 32-bit limbs: errors
    at the u64-engine grade (~1e-12), three decades below the single-prime
    w32 engine (~1e-7 at Δ=2**25)."""
    params, ctx, kg, ev, enc, dec = _setup()
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, ctx.params.slots)
    ct = enc.encrypt(ev.make_plain(x, params.scale, ctx.L))
    out = ev.rescale(ev.multiply(ct, ct))
    assert out.level == ctx.L - 2                  # one logical level = pair
    assert abs(out.scale / params.scale - 1) < 2 ** -8
    assert np.max(np.abs(dec.decrypt(out) - x * x)) < 1e-10
    out2 = ev.rescale(ev.multiply(out, out))
    assert np.max(np.abs(dec.decrypt(out2) - x ** 4)) < 1e-9
    rot = ev.rotate(ct, 7)
    assert np.max(np.abs(dec.decrypt(rot) - np.roll(x, -7))) < 1e-9
    cj = ev.conjugate(ct)
    assert np.max(np.abs(dec.decrypt(cj) - np.conj(x))) < 1e-9


def test_composite_set_scale_exact_and_reduced_error_add():
    params, ctx, kg, ev, enc, dec = _setup()
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, ctx.params.slots)
    y = rng.uniform(-1, 1, ctx.params.slots)
    a = enc.encrypt(ev.make_plain(x, params.scale, ctx.L))
    b = enc.encrypt(ev.make_plain(y, params.scale * 1.37, ctx.L))
    out = ev.add_reduced_error(a, b)
    assert np.max(np.abs(dec.decrypt(out) - (x + y))) < 1e-9


@pytest.mark.slow
def test_composite_full_bootstrap():
    """Full bootstrap on the composite engine: mean abs error must match the
    u64 engine at the identical ring (~1.2e-4), proving the w32 noise floor
    is gone. Error harness per run_bootstrapping.cpp:196-212."""
    from fhe_gpt2_tpu.boot.bootstrap import Bootstrapper, make_evalmod
    from fhe_gpt2_tpu.nn.backend import CkksBackend

    params, ctx, kg, ev, enc, dec = _setup(levels=22, sparse=NS)
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=None, default_level=ctx.L)
    eps = params.scale / ctx.q0_float
    em = make_evalmod(K=12, eps=max(eps * 1.05, 2 ** -5), degree=45,
                      arcsin_degree=3, prec_dps=60)
    boot = Bootstrapper(B, num_slots=NS, evalmod=em)
    ev.galois_keys = kg.galois_keys(steps=boot.required_steps(),
                                    conjugate=True)
    rng = np.random.default_rng(5)
    z = rng.uniform(-1, 1, NS)
    ct = enc.encrypt(ev.make_plain(z, params.scale, ctx.base_limbs))
    out = boot.bootstrap(ct)
    assert out.level >= ctx.base_limbs + 2 * ctx.rescale_limbs, out.level
    back = np.real(dec.decrypt(out, num_slots=NS))
    err = np.abs(back - z)
    print(f"composite bootstrap: out level {out.level}, "
          f"mean err {err.mean():.2e}, max {err.max():.2e}")
    assert err.mean() < 5e-4, err.mean()           # w32 floor was ~1.4e-2
    assert err.max() < 2e-3, err.max()
