"""Mini-ResNet with REAL bootstraps on the composite engine — the exact
architecture of the TPU ResNet-20 run (run_resnet --composite --real-boot
--jit --digit-keys --boot-factors 3 --start-level/--headroom), validated
end-to-end at a toy ring.

Covers: composite two-prime scaling, the production EvalMod window
(K=25/deg59 — the reference's h=192 window, infer_seal.cpp:287-322), the
level-exact schedule (encrypt at the post-bootstrap level so every ReLU
runs at one level = one compiled program; convs at the limbs-cheap chain
bottom), base-16 digit rotation keys with decomposed rotations, and the
jitted segment driver with staged-jit bootstraps between segments.
Measured on this schedule: bootstrap consumes 21 logical levels
(levels=39 -> out 18), ReLU (sign 2^-10, [7,15,27]) consumes 16.
"""

import numpy as np
import pytest

from fhe_gpt2_tpu.approx.minimax import dp_schedule
from fhe_gpt2_tpu.cnn import resnet as R
from fhe_gpt2_tpu.nn import kernels as K
from fhe_gpt2_tpu.nn.backend import CkksBackend, PlainBackend, RecordingBackend

from test_cnn_encrypted import synthetic_weights

DEPTH, H, LOGN = 8, 4, 10          # 2 residual blocks, 4x4 images
LEVELS, START, HEADROOM = 39, 18, 2


@pytest.mark.slow
def test_mini_resnet_composite_real_boot():
    from fhe_gpt2_tpu.boot.bootstrap import Bootstrapper, make_evalmod
    from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
    from fhe_gpt2_tpu.core.evaluator import Decryptor, Encryptor, Evaluator
    from fhe_gpt2_tpu.core.keys import KeyGenerator, digit_steps

    rng = np.random.default_rng(0)
    weights = synthetic_weights(rng, depth=DEPTH)
    img = rng.uniform(-1, 1, (3, H, H))
    want = R.forward_float(weights, DEPTH, img)

    slots = 1 << (LOGN - 1)
    sign = K.SignPlans.from_composite(
        dp_schedule(target_err=2.0 ** -10, eps=2.0 ** -8))
    rp = R.build_resnet_plans(weights, DEPTH, slots, h=H, relu_bound=10.0,
                              sign=sign)
    assert rp.relu_need == 16, rp.relu_need   # schedule below assumes this

    plain = R.logits_from_slots(
        rp, R.forward(PlainBackend(slots), R.pack_input(rp, img), rp,
                      boot_between=False)[0])
    assert np.argmax(plain) == np.argmax(want)

    params = CkksParams.create_composite(
        logn=LOGN, num_levels=LEVELS, log_scale=50, log_q0=55,
        log_special=31, num_special=4, hamming_weight=16)
    ctx = CkksContext(params)
    assert ctx.word_bits == 32 and ctx.rescale_limbs == 2
    lvl = ctx.base_limbs + START * ctx.rescale_limbs
    kg = KeyGenerator(ctx, seed=1)
    ev = Evaluator(ctx, relin_key=kg.relin_key())
    enc = Encryptor(ctx, secret=kg.secret, seed=2)
    dec = Decryptor(ctx, kg.secret)
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=dec, default_level=lvl)
    B.min_level_headroom = HEADROOM
    eps = params.scale / ctx.q0_float
    em = make_evalmod(K=25, eps=max(eps * 1.05, 2 ** -5), degree=59,
                      arcsin_degree=3, prec_dps=80)
    B.boot = Bootstrapper(B, evalmod=em, cts_factors=3, stc_factors=3)
    ev.galois_keys = kg.galois_keys(
        steps=sorted(digit_steps(ctx.params.slots, base=16)), conjugate=True)

    n_boots = [0]
    inner = B.bootstrap

    def counting_boot(a, **kw):
        n_boots[0] += 1
        out = inner(a, **kw)
        # One refresh per ReLU, placed OUTSIDE the traced segments: inputs
        # are the post-conv chain bottom (or the stem start level), output
        # is always the same post-bootstrap level -> one compiled ReLU.
        assert out.level == ctx.base_limbs + (LEVELS - 21) * 2
        return out

    B.bootstrap = counting_boot

    xs = [B.from_slots(v) for v in R.pack_input(rp, img)]
    out = R.forward(B, xs, rp, jit=True)       # the TPU segment driver
    got = R.logits_from_slots(rp, B.to_slots(out[0]))

    assert np.argmax(got) == np.argmax(want), (got, want)
    err = np.abs(got - plain).max()
    assert err < 0.1, err
    # One bootstrap per ReLU per ciphertext (+ the pre-tail refresh); no
    # mid-segment auto-bootstraps (those would inflate the count).
    n_relus = 1 + 2 * len(rp.blocks)
    n_cts = len(xs)
    assert n_boots[0] <= (n_relus + 1) * max(
        n_cts, 2), (n_boots[0], n_relus)
