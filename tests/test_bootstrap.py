"""Full CKKS bootstrap test (small ring): level recovery + precision.

The numeric harness mirrors the reference's run_bootstrapping.cpp:145-222:
encode a random vector at sparse slots, exhaust the modulus chain, bootstrap,
and report mean absolute error.
"""

import numpy as np
import pytest

from fhe_gpt2_tpu.boot.bootstrap import Bootstrapper, make_evalmod, eval_mod
from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
from fhe_gpt2_tpu.core.evaluator import Decryptor, Encryptor, Evaluator
from fhe_gpt2_tpu.core.keys import KeyGenerator
from fhe_gpt2_tpu.nn.backend import CkksBackend, PlainBackend

LOGN = 10
LEVELS = 22
NS = 64


def test_evalmod_plain():
    """EvalMod pipeline on the plain backend: x -> centered frac(x)."""
    em = make_evalmod(K=12, eps=2 ** -8, degree=30, arcsin_degree=3,
                      prec_dps=60)
    B = PlainBackend(256)
    rng = np.random.default_rng(0)
    I = rng.integers(-10, 11, 256).astype(np.float64)
    f = rng.uniform(-2.0 ** -9, 2.0 ** -9, 256)
    x = I + f
    got = eval_mod(B, x, em)
    err = np.abs(got - f)
    assert err.max() < 5e-6, err.max()


@pytest.mark.slow
def test_full_bootstrap():
    # q0/Δ = 2^5 like the reference regime (logq0 51 / logp 46): the
    # EvalMod output amplitude (and its error amplification) is q0/Δ.
    params = CkksParams.create(
        logn=LOGN, log_q0=45, log_scale=40, num_levels=LEVELS,
        log_special=51, hamming_weight=16, sparse_slots=NS)
    ctx = CkksContext(params)
    kg = KeyGenerator(ctx, seed=3)
    enc = Encryptor(ctx, secret=kg.secret, seed=4)
    dec = Decryptor(ctx, kg.secret)
    ev = Evaluator(ctx, relin_key=kg.relin_key())
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=dec, default_level=LEVELS)
    em = make_evalmod(K=12, eps=2 ** -5, degree=45, arcsin_degree=3,
                      prec_dps=60)
    boot = Bootstrapper(B, num_slots=NS, evalmod=em)
    ev.galois_keys = kg.galois_keys(steps=boot.required_steps(),
                                    conjugate=True)

    rng = np.random.default_rng(5)
    z = rng.uniform(-1, 1, NS)
    ct = enc.encrypt(ev.make_plain(z, params.scale, 1))   # exhausted chain
    assert ct.level == 1

    out = boot.bootstrap(ct)
    assert out.level >= 4, f"levels remaining after bootstrap: {out.level}"
    back = np.real(dec.decrypt(out, num_slots=NS))
    err = np.abs(back - z)
    print(f"bootstrap: out level {out.level}, scale {out.scale:.3e}, "
          f"mean err {err.mean():.2e}, max err {err.max():.2e}")
    # Reference-grade target: mean abs error ~1e-2 or better at these params
    # (run_bootstrapping.cpp error metric).
    assert err.mean() < 1e-2
    assert err.max() < 5e-2


@pytest.mark.slow
def test_full_bootstrap_w32():
    """Same harness on the uint32 engine (25-bit scale, 29-bit q0): the
    level budget must match the u64 pipeline exactly (the Chebyshev plan
    evaluator's exact scale targeting keeps every add correction-free even
    with primes ~2^-11 off Δ), and the error floor is set by the wider
    eps = Δ/q0 = 2^-4 EvalMod window times the q0/Δ amplitude."""
    params = CkksParams.create(
        logn=LOGN, log_q0=29, log_scale=25, num_levels=LEVELS,
        log_special=31, num_special=2, hamming_weight=16, sparse_slots=NS)
    ctx = CkksContext(params)
    assert ctx.word_bits == 32
    kg = KeyGenerator(ctx, seed=3)
    enc = Encryptor(ctx, secret=kg.secret, seed=4)
    dec = Decryptor(ctx, kg.secret)
    ev = Evaluator(ctx, relin_key=kg.relin_key())
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=dec, default_level=LEVELS)
    eps = params.scale / ctx.q0_float
    em = make_evalmod(K=12, eps=max(eps * 1.05, 2 ** -5), degree=45,
                      arcsin_degree=3, prec_dps=60)
    boot = Bootstrapper(B, num_slots=NS, evalmod=em)
    ev.galois_keys = kg.galois_keys(steps=boot.required_steps(),
                                    conjugate=True)

    rng = np.random.default_rng(5)
    z = rng.uniform(-1, 1, NS)
    ct = enc.encrypt(ev.make_plain(z, params.scale, 1))
    out = boot.bootstrap(ct)
    assert out.level >= 4, f"levels remaining after bootstrap: {out.level}"
    back = np.real(dec.decrypt(out, num_slots=NS))
    err = np.abs(back - z)
    print(f"w32 bootstrap: out level {out.level}, mean err {err.mean():.2e}, "
          f"max err {err.max():.2e}")
    assert err.mean() < 2e-2
    assert err.max() < 8e-2


@pytest.mark.slow
def test_auto_bootstrap_in_kernel():
    """Backend auto-boot: a minimax ReLU started on a nearly-exhausted
    ciphertext refreshes itself mid-kernel via the real Bootstrapper — the
    TPU-native form of the reference's mid-kernel bootstraps
    (Fold.cpp:95-96), with no hand-placed bootstrap calls."""
    from fhe_gpt2_tpu.approx.minimax import auto_schedule
    from fhe_gpt2_tpu.nn import kernels as K
    from fhe_gpt2_tpu.core.keys import KeyGenerator

    # Deeper chain than the plain bootstrap tests: the pipeline consumes 18
    # levels (CtS 2 + re/im 1 + EvalMod 12 + recombine 1 + StC 2), so L=28
    # leaves ~7 usable levels per refresh — enough for a composite-sign
    # stage to make progress between auto-boots. (At L=22 a refresh lands
    # right back at the headroom floor, the kernel thrashes, and bootstrap
    # noise compounds.)
    LEVELS = 28
    params = CkksParams.create(
        logn=LOGN, log_q0=45, log_scale=40, num_levels=LEVELS,
        log_special=51, hamming_weight=16, sparse_slots=NS)
    ctx = CkksContext(params)
    kg = KeyGenerator(ctx, seed=3)
    enc = Encryptor(ctx, secret=kg.secret, seed=4)
    dec = Decryptor(ctx, kg.secret)
    ev = Evaluator(ctx, relin_key=kg.relin_key())
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=dec, default_level=LEVELS)
    em = make_evalmod(K=12, eps=2 ** -5, degree=45, arcsin_degree=3,
                      prec_dps=60)
    B.boot = Bootstrapper(B, num_slots=NS, evalmod=em)
    ev.galois_keys = kg.galois_keys(steps=B.boot.required_steps(),
                                    conjugate=True)

    sp = K.SignPlans.from_composite(
        auto_schedule(target_err=2.0 ** -8, eps=2.0 ** -6))
    rng = np.random.default_rng(7)
    z = rng.uniform(-0.9, 0.9, NS)
    # Start at level 5: the sign composite needs far more — auto-boot must
    # fire at least once inside the kernel.
    ct = enc.encrypt(ev.make_plain(z, params.scale, 5))
    out = K.relu(B, ct, sp)
    back = np.real(dec.decrypt(out, num_slots=NS))
    err = np.abs(back - np.maximum(z, 0.0))
    # Points within the sign dead-zone eps contribute |x|<2^-6 error at most.
    assert err.mean() < 2e-2 and err.max() < 6e-2, (err.mean(), err.max())
