"""uint32-engine (word-32) scheme tests.

The word size is inferred from the modulus chain (core/modmath.word_dtype);
these mirror the u64 scheme tests at a small ring and pin the noise behavior
that drove the parameter presets: multi-special-prime hybrid keyswitching
(P >> digit products) keeps rotation noise near the encoding floor.
"""

import numpy as np
import pytest

from fhe_gpt2_tpu.core.context import CkksContext, test_params_w32
from fhe_gpt2_tpu.core.evaluator import Decryptor, Encryptor, Evaluator
from fhe_gpt2_tpu.core.keys import KeyGenerator


@pytest.fixture(scope="module")
def w32():
    params = test_params_w32()
    ctx = CkksContext(params)
    assert ctx.word_bits == 32
    kg = KeyGenerator(ctx, seed=1)
    ev = Evaluator(ctx, relin_key=kg.relin_key(),
                   galois_keys=kg.galois_keys(steps=[1, 3], conjugate=True))
    enc = Encryptor(ctx, secret=kg.secret, seed=2)
    dec = Decryptor(ctx, kg.secret)
    return params, ctx, ev, enc, dec


def _msg(ctx, seed=0, complex_=True):
    rng = np.random.default_rng(seed)
    z = rng.uniform(-1, 1, ctx.params.slots)
    if complex_:
        z = z + 1j * rng.uniform(-1, 1, ctx.params.slots)
    return z


def test_word_inference(w32):
    params, ctx, *_ = w32
    assert params.word_bits == 32
    assert ctx.ntt_all.q.dtype == np.uint32


def test_encrypt_decrypt(w32):
    params, ctx, ev, enc, dec = w32
    z = _msg(ctx)
    ct = enc.encrypt(ev.make_plain(z, params.scale, params.levels))
    assert ct.data.dtype == np.uint32
    assert np.abs(dec.decrypt(ct) - z).max() < 1e-3


def test_mult_relin_rescale(w32):
    params, ctx, ev, enc, dec = w32
    z = _msg(ctx)
    ct = enc.encrypt(ev.make_plain(z, params.scale, params.levels))
    out = ev.rescale(ev.multiply(ct, ct))
    assert np.abs(dec.decrypt(out) - z * z).max() < 1e-3


def test_rotate_conjugate(w32):
    params, ctx, ev, enc, dec = w32
    z = _msg(ctx)
    ct = enc.encrypt(ev.make_plain(z, params.scale, params.levels))
    assert np.abs(dec.decrypt(ev.rotate(ct, 3)) - np.roll(z, -3)).max() < 1e-3
    assert np.abs(dec.decrypt(ev.conjugate(ct)) - np.conj(z)).max() < 1e-3


def test_rotation_noise_floor(w32):
    """P (product of special primes) dominates digit products, so a rotation
    adds noise near the fresh-encryption floor — the property that makes the
    25-bit scale viable (measured ~3e-5; the single-30-bit-special variant
    measured ~5e-4)."""
    params, ctx, ev, enc, dec = w32
    z = np.real(_msg(ctx, complex_=False))
    ct = enc.encrypt(ev.make_plain(z, params.scale, params.levels))
    err = np.abs(np.real(dec.decrypt(ev.rotate(ct, 1))) - np.roll(z, -1)).max()
    assert err < 2e-4


def test_depth_chain(w32):
    """Repeated squaring to the bottom of the chain stays ~2x/level (no
    cross-term blowup)."""
    params, ctx, ev, enc, dec = w32
    z = np.real(_msg(ctx, complex_=False))
    ct = enc.encrypt(ev.make_plain(z, params.scale, params.levels))
    w = z.copy()
    for _ in range(params.levels - 1):
        ct = ev.rescale(ev.multiply(ct, ct))
        w = w * w
    assert np.abs(np.real(dec.decrypt(ct)) - w).max() < 5e-3


def test_hoisted_rotations(w32):
    params, ctx, ev, enc, dec = w32
    z = _msg(ctx)
    ct = enc.encrypt(ev.make_plain(z, params.scale, params.levels))
    outs = ev.rotate_hoisted(ct, [1, 3])
    for s, o in zip([1, 3], outs):
        assert np.abs(dec.decrypt(o) - np.roll(z, -s)).max() < 1e-3


def test_reduced_error_ops(w32):
    params, ctx, ev, enc, dec = w32
    z = _msg(ctx)
    ct = enc.encrypt(ev.make_plain(z, params.scale, params.levels))
    low = ev.rescale(ev.multiply(ct, ct))          # one level down
    s = ev.add_reduced_error(low, ct)
    assert np.abs(dec.decrypt(s) - (z * z + z)).max() < 2e-3
    d = ev.sub_reduced_error(low, ct)
    assert np.abs(dec.decrypt(d) - (z * z - z)).max() < 2e-3
    m = ev.multiply_reduced_error(low, ct)
    assert np.abs(dec.decrypt(ev.rescale(m)) - z * z * z).max() < 2e-3
