"""Mini-ResNet with REAL bootstraps on the composite engine — the exact
combination the TPU ResNet-20 run uses (run_resnet --composite --real-boot
--jit), validated end-to-end at a small ring before burning TPU hours.

Covers: composite two-prime scaling chain, production EvalMod window
(K=25/deg59 — the reference's h=192 window, infer_seal.cpp:287-322), the
level-safe boot schedule (maybe_bootstrap in logical levels), and the
jitted segment driver with staged-jit bootstraps between segments.
"""

import numpy as np
import pytest

from fhe_gpt2_tpu.approx.minimax import dp_schedule
from fhe_gpt2_tpu.cnn import resnet as R
from fhe_gpt2_tpu.nn import kernels as K
from fhe_gpt2_tpu.nn.backend import CkksBackend, PlainBackend, RecordingBackend

from test_cnn_encrypted import synthetic_weights, DEPTH, H, LOGN


@pytest.mark.slow
def test_mini_resnet_composite_real_boot():
    from fhe_gpt2_tpu.boot.bootstrap import Bootstrapper, make_evalmod
    from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
    from fhe_gpt2_tpu.core.evaluator import Decryptor, Encryptor, Evaluator
    from fhe_gpt2_tpu.core.keys import KeyGenerator

    rng = np.random.default_rng(0)
    weights = synthetic_weights(rng)
    img = rng.uniform(-1, 1, (3, H, H))
    want = R.forward_float(weights, DEPTH, img)

    slots = 1 << (LOGN - 1)
    # The TPU run's composite sign target (run_resnet serr=-12 default).
    sign = K.SignPlans.from_composite(
        dp_schedule(target_err=2.0 ** -12, eps=2.0 ** -10))
    rp = R.build_resnet_plans(weights, DEPTH, slots, h=H, relu_bound=10.0,
                              sign=sign)
    print(f"relu_need={rp.relu_need} logical levels")

    plain = R.logits_from_slots(
        rp, R.forward(PlainBackend(slots), R.pack_input(rp, img), rp,
                      boot_between=False)[0])
    assert np.argmax(plain) == np.argmax(want)

    rec = RecordingBackend(slots)
    R.forward(rec, R.pack_input(rp, img), rp, boot_between=False)

    levels = 30                    # logical pairs — the TPU run's default
    params = CkksParams.create_composite(
        logn=LOGN, num_levels=levels, log_scale=50, log_q0=55,
        log_special=31, num_special=3, hamming_weight=32)
    ctx = CkksContext(params)
    assert ctx.word_bits == 32 and ctx.rescale_limbs == 2
    kg = KeyGenerator(ctx, seed=1)
    ev = Evaluator(ctx, relin_key=kg.relin_key())
    enc = Encryptor(ctx, secret=kg.secret, seed=2)
    dec = Decryptor(ctx, kg.secret)
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=dec,
                    default_level=len(params.moduli))

    # Production EvalMod window at this chain's actual eps (= Δ/Q0 = 2^-5).
    eps = params.scale / ctx.q0_float
    em = make_evalmod(K=25, eps=max(eps * 1.05, 2 ** -5), degree=59,
                      arcsin_degree=3, prec_dps=80)
    B.boot = Bootstrapper(B, evalmod=em, cts_factors=2, stc_factors=2)
    steps = set(rec.key_steps()) | set(B.boot.required_steps())
    ev.galois_keys = kg.galois_keys(steps=sorted(steps), conjugate=True)

    xs = [B.from_slots(v) for v in R.pack_input(rp, img)]
    out = R.forward(B, xs, rp, jit=True)       # the TPU segment driver
    got = R.logits_from_slots(rp, B.to_slots(out[0]))

    print("got ", np.round(got, 4))
    print("want", np.round(want, 4))
    assert np.argmax(got) == np.argmax(want), (got, want)
    # Composite precision: dominated by the minimax-ReLU approximation, not
    # the 2^-50 crypto noise; the bound is far tighter than the single-prime
    # w32 test's 0.25.
    assert np.abs(got - plain).max() < 0.1, np.abs(got - plain).max()
