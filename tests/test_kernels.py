"""Kernel tests on the plaintext-simulator backend vs numpy oracles."""

import numpy as np
import pytest

from fhe_gpt2_tpu.approx.minimax import (
    auto_schedule, gelu_approx, gelu_float,
)
from fhe_gpt2_tpu.nn import kernels as K
from fhe_gpt2_tpu.nn.backend import PlainBackend

SLOTS = 256
B = PlainBackend(SLOTS)


@pytest.fixture(scope="module")
def sp():
    return K.SignPlans.from_composite(
        auto_schedule(target_err=2.0 ** -13, eps=2.0 ** -6))


def test_fold_sum():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(SLOTS)
    got = K.fold_sum(B, x, 16)
    want = np.array([x[np.arange(t, t + 16) % SLOTS].sum() for t in range(SLOTS)])
    assert np.allclose(got, want)


def test_replicate():
    rng = np.random.default_rng(1)
    x = np.zeros(SLOTS)
    x[:8] = rng.standard_normal(8)
    got = K.replicate(B, x, 8, 4)
    for j in range(4):
        assert np.allclose(got[j * 8:(j + 1) * 8], x[:8])


def test_sign_and_relu(sp):
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, SLOTS)
    x[np.abs(x) < 2 ** -6] += 0.1       # keep within the composite's domain
    s = K.sign(B, x, sp)
    assert np.abs(s - np.sign(x)).max() < 2 ** -12
    r = K.relu(B, x, sp)
    assert np.abs(r - np.maximum(x, 0)).max() < 2 ** -10


def test_fold_max(sp):
    rng = np.random.default_rng(3)
    x = rng.uniform(-0.4, 0.4, SLOTS)
    got = K.fold_max(B, x, 8, sp, bound=1.0)
    want = np.array([x[np.arange(t, t + 8) % SLOTS].max() for t in range(SLOTS)])
    assert np.abs(got - want).max() < 1e-3


def test_gelu_even():
    x = np.linspace(-8, 8, SLOTS)
    got = K.gelu(B, x, bound=8.0, degree=46)
    want = gelu_float(x)
    assert np.abs(got - want).max() < 1e-6


def test_gelu_windows(sp):
    gp = K.GeluPlans.make(sp, in_bound=16.0)
    x = np.linspace(-8, 8, SLOTS)
    got = K.gelu_windows(B, x, gp)
    want = gelu_float(x)
    # Window-mask leakage multiplies sign error by out-of-segment poly
    # values; interior of the active windows is Remez-bounded.
    assert np.abs(got - want).max() < 0.1
    inner = np.abs(x) < 4
    assert np.abs(got - want)[inner].max() < 5e-3


def test_exp():
    x = np.linspace(-4, 2, SLOTS)
    got = K.exp(B, x, r=10)
    assert np.abs(got - np.exp(x)).max() < 2e-2


def test_inverse():
    x = np.linspace(50.0, 1500.0, SLOTS)
    got = K.inverse(B, x, iters=11, prescale=1e-3)
    assert np.abs(got - 1.0 / x).max() < 1e-6


def test_newton_rsqrt():
    x = np.linspace(5e5, 5e7, SLOTS)
    got = K.newton_rsqrt(B, x, init=4e7, iters=13)
    assert np.abs(got / (1.0 / np.sqrt(x)) - 1).max() < 1e-9
