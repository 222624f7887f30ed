"""Encrypted CNN pipeline tests at a small ring (uint32 engine).

The reference validates its encrypted ResNet only via the full-scale run log
(result/resnet20_cifar10_image0.txt); here a miniature ResNet (depth 8, 8x8
images, synthetic weights) runs the REAL encrypted path — planar packing,
conv/downsample/pool/FC LT plans, B-boundary ReLU, fake-bootstrap level
resets, and the jitted segment driver (_forward_jit) that the TPU run uses —
against the float oracle. Catches scale-drift / schedule bugs that the
plain simulator cannot see.
"""

import numpy as np
import pytest

from fhe_gpt2_tpu.approx.minimax import dp_schedule
from fhe_gpt2_tpu.cnn import resnet as R
from fhe_gpt2_tpu.nn import kernels as K
from fhe_gpt2_tpu.nn.backend import CkksBackend, RecordingBackend

DEPTH = 14         # n = 2: same-geometry block pairs per stage exercise the
                   # compiled-program sharing + rebind path (_forward_jit)
H = 8              # 8x8 "images"
LOGN = 11          # 1024 slots: 16*8*8 = 1024 -> 1 ct per 16-wide tensor


def synthetic_weights(rng, depth=DEPTH, n_classes=10):
    """Reference-format weight dict (load_reference_weights layout) with
    BN statistics chosen to keep activations well inside the ReLU bound."""
    n = (depth - 2) // 6
    w = {"conv1": rng.standard_normal((16, 3, 3, 3)) * 0.25}

    def bn(p, c):
        w[f"{p}_weight"] = rng.uniform(0.7, 1.3, c)
        w[f"{p}_bias"] = rng.standard_normal(c) * 0.1
        w[f"{p}_running_mean"] = rng.standard_normal(c) * 0.1
        w[f"{p}_running_var"] = rng.uniform(0.5, 1.5, c)

    bn("bn1", 16)
    widths = [16, 32, 64]
    for s in range(1, 4):
        cw = widths[s - 1]
        cin = widths[max(0, s - 2)] if s > 1 else 16
        for b in range(n):
            p = f"layer{s}_{b}_"
            c1_in = cin if b == 0 else cw
            w[p + "conv1"] = rng.standard_normal((cw, c1_in, 3, 3)) * (
                0.4 / np.sqrt(c1_in))
            w[p + "conv2"] = rng.standard_normal((cw, cw, 3, 3)) * (
                0.4 / np.sqrt(cw))
            bn(p + "bn1", cw)
            bn(p + "bn2", cw)
    w["linear_weight"] = rng.standard_normal((n_classes, 64)) * 0.3
    w["linear_bias"] = rng.standard_normal(n_classes) * 0.1
    return w


@pytest.mark.slow
def test_mini_resnet_encrypted_vs_oracle():
    from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
    from fhe_gpt2_tpu.core.evaluator import Decryptor, Encryptor, Evaluator
    from fhe_gpt2_tpu.core.keys import KeyGenerator

    rng = np.random.default_rng(0)
    weights = synthetic_weights(rng)
    img = rng.uniform(-1, 1, (3, H, H))
    want = R.forward_float(weights, DEPTH, img)

    slots = 1 << (LOGN - 1)
    sign = K.SignPlans.from_composite(
        dp_schedule(target_err=2.0 ** -7, eps=2.0 ** -5))
    rp = R.build_resnet_plans(weights, DEPTH, slots, h=H, relu_bound=10.0,
                              sign=sign)

    # Plain run pins algorithm correctness at these shapes first.
    from fhe_gpt2_tpu.nn.backend import PlainBackend
    plain = R.logits_from_slots(
        rp, R.forward(PlainBackend(slots), R.pack_input(rp, img), rp,
                      boot_between=False)[0])
    assert np.argmax(plain) == np.argmax(want)

    rec = RecordingBackend(slots)
    R.forward(rec, R.pack_input(rp, img), rp, boot_between=False)

    levels = 14    # forces several fake-boot refreshes across the forward
    params = CkksParams.create(
        logn=LOGN, log_q0=29, log_scale=25, num_levels=levels,
        log_special=31, num_special=3, hamming_weight=32)
    ctx = CkksContext(params)
    assert ctx.word_bits == 32
    kg = KeyGenerator(ctx, seed=1)
    ev = Evaluator(ctx, relin_key=kg.relin_key(),
                   galois_keys=kg.galois_keys(steps=rec.key_steps(),
                                              conjugate=True))
    enc = Encryptor(ctx, secret=kg.secret, seed=2)
    dec = Decryptor(ctx, kg.secret)
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=dec, default_level=levels)

    xs = [B.from_slots(v) for v in R.pack_input(rp, img)]
    out = R.forward(B, xs, rp, jit=True)       # the TPU segment driver
    got = R.logits_from_slots(rp, B.to_slots(out[0]))

    assert np.argmax(got) == np.argmax(want), (got, want)
    # Mini-net tolerance: minimax-ReLU dead zone (10*2^-5) plus w32 noise.
    assert np.abs(got - plain).max() < 0.25, np.abs(got - plain).max()
