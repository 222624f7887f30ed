"""CNN kernel + ResNet tests (plain simulator vs numpy oracles)."""

import numpy as np
import pytest

from fhe_gpt2_tpu.approx.minimax import auto_schedule
from fhe_gpt2_tpu.cnn import conv as C
from fhe_gpt2_tpu.cnn import resnet as R
from fhe_gpt2_tpu.nn import kernels as K
from fhe_gpt2_tpu.nn.backend import PlainBackend
from fhe_gpt2_tpu.nn.linear import apply_lt


def test_conv2d_spec_stride1():
    rng = np.random.default_rng(0)
    lin = C.PlanarLayout(4, 8, 8, 512)
    lout = C.PlanarLayout(6, 8, 8, 512)
    x = rng.standard_normal((4, 8, 8))
    w = rng.standard_normal((6, 4, 3, 3)) * 0.2
    spec = C.conv2d_spec(w, lin, lout)
    B = PlainBackend(512)
    out = apply_lt(B, spec.bsgs_plan(), list(lin.pack(x)))
    got = lout.unpack(np.stack(out))
    want = R._conv2d_np(x, w)
    assert np.abs(got - want).max() < 1e-10


def test_conv2d_spec_stride2():
    rng = np.random.default_rng(1)
    lin = C.PlanarLayout(4, 8, 8, 512)
    lout = C.PlanarLayout(8, 4, 4, 512)
    x = rng.standard_normal((4, 8, 8))
    w = rng.standard_normal((8, 4, 3, 3)) * 0.2
    spec = C.conv2d_spec(w, lin, lout, stride=2)
    B = PlainBackend(512)
    out = apply_lt(B, spec.bsgs_plan(), list(lin.pack(x)))
    got = lout.unpack(np.stack(out))
    want = R._conv2d_np(x, w, stride=2)
    assert np.abs(got - want).max() < 1e-10


def test_avgpool_and_fc():
    rng = np.random.default_rng(2)
    lin = C.PlanarLayout(8, 4, 4, 256)
    x = rng.standard_normal((8, 4, 4))
    B = PlainBackend(256)
    pooled = apply_lt(B, C.avgpool_spec(lin, 256).bsgs_plan(),
                      list(lin.pack(x)))
    assert np.allclose(pooled[0][:8], x.mean((1, 2)), atol=1e-12)
    w = rng.standard_normal((8, 5))
    out = apply_lt(B, C.fc_spec(w, 8, 256).bsgs_plan(), pooled)
    assert np.allclose(out[0][:5], x.mean((1, 2)) @ w, atol=1e-10)


def test_fold_bn():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((6, 4, 3, 3))
    gamma, beta = rng.uniform(0.5, 1.5, 6), rng.standard_normal(6) * 0.1
    mean, var = rng.standard_normal(6) * 0.2, rng.uniform(0.5, 2.0, 6)
    x = rng.standard_normal((4, 8, 8))
    wf, bf = C.fold_bn(w, np.zeros(6), gamma, beta, mean, var)
    direct = R._conv2d_np(x, w)
    s = gamma / np.sqrt(var + 1e-5)
    want = direct * s[:, None, None] + (beta - mean * s)[:, None, None]
    got = R._conv2d_np(x, wf) + bf[:, None, None]
    assert np.abs(got - want).max() < 1e-10


@pytest.mark.slow
def test_resnet20_plain_vs_oracle():
    """Full ResNet-20 with the reference's pretrained weights on the plain
    simulator vs the float oracle — the E2E pipeline the reference validates
    with result/resnet20_cifar10_image0.txt."""
    weights = R.load_reference_weights(20)
    rng = np.random.default_rng(4)
    img = rng.uniform(-1, 1, (3, 32, 32))   # CIFAR test images are stripped
    want = R.forward_float(weights, 20, img)

    slots = 16384
    sign = K.SignPlans.from_composite(
        auto_schedule(target_err=2.0 ** -12, eps=2.0 ** -9))
    rp = R.build_resnet_plans(weights, 20, slots, sign=sign)
    B = PlainBackend(slots)
    lay = rp.layouts[0]
    out = R.forward(B, R.pack_input(rp, img), rp, boot_between=False)
    got = R.logits_from_slots(rp, out[0])
    print("logits got ", np.round(got, 3))
    print("logits want", np.round(want, 3))
    assert got.argmax() == want.argmax()
    assert np.abs(got - want).max() < 0.5


@pytest.mark.slow
def test_resnet32_cifar100_plain_vs_oracle():
    """CIFAR-100 variant: option-B learned downsample shortcuts + 100-way FC
    (import_parameters_cifar100 parity)."""
    from fhe_gpt2_tpu.approx.minimax import auto_schedule
    from fhe_gpt2_tpu.nn import kernels as K

    weights = R.load_reference_weights(32, dataset="cifar100")
    assert weights["linear_weight"].shape == (100, 64)
    assert "layer2_0_shortcut_conv" in weights
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (3, 32, 32))
    want = R.forward_float(weights, 32, img)
    assert want.shape == (100,)
    slots = 16384
    sign = K.SignPlans.from_composite(
        auto_schedule(target_err=2.0 ** -12, eps=2.0 ** -9))
    rp = R.build_resnet_plans(weights, 32, slots, sign=sign)
    B = PlainBackend(slots)
    out = R.forward(B, R.pack_input(rp, img), rp, boot_between=False)
    got = R.logits_from_slots(rp, out[0])
    assert np.argmax(got) == np.argmax(want)
    assert np.abs(got - want).max() < 0.5, np.abs(got - want).max()
