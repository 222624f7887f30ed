"""End-to-end CKKS scheme tests on small parameters.

Mirrors the reference's doctest `Init` suite pattern (run_test.cpp:61): build a
full real context — no mocked crypto — encrypt, evaluate, decrypt, compare.
"""

import numpy as np
import pytest

from fhe_gpt2_tpu.core import embedding, ntt as nttmod
from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
from fhe_gpt2_tpu.core.evaluator import (
    Ciphertext, Decryptor, Encryptor, Evaluator, fake_bootstrap,
)
from fhe_gpt2_tpu.core.keys import KeyGenerator


LOGN = 8
N = 1 << LOGN
SLOTS = N // 2


@pytest.fixture(scope="module")
def setup():
    params = CkksParams.create(
        logn=LOGN, log_q0=50, log_scale=40, num_levels=3,
        log_special=51, hamming_weight=16,
    )
    ctx = CkksContext(params)
    kg = KeyGenerator(ctx, seed=7)
    relin = kg.relin_key()
    gk = kg.galois_keys(steps=[1, 2, 3, 5, SLOTS - 1], conjugate=True)
    ev = Evaluator(ctx, relin_key=relin, galois_keys=gk)
    enc = Encryptor(ctx, secret=kg.secret, public=kg.public_key(), seed=11)
    dec = Decryptor(ctx, kg.secret)
    return ctx, ev, enc, dec


def rand_vec(rng, real=False):
    if real:
        return rng.uniform(-1, 1, SLOTS)
    return rng.uniform(-1, 1, SLOTS) + 1j * rng.uniform(-1, 1, SLOTS)


def test_encode_decode_roundtrip(setup):
    ctx, ev, enc, dec = setup
    rng = np.random.default_rng(0)
    z = rand_vec(rng)
    pt = ev.make_plain(z, ctx.params.scale, 3)
    back = ev.decode_plain(pt)
    assert np.allclose(back, z, atol=1e-8)


def test_rotation_slot_convention(setup):
    """Coefficient-domain automorphism X->X^{5^r} rotates slots left by r."""
    ctx, ev, enc, dec = setup
    rng = np.random.default_rng(1)
    z = rand_vec(rng)
    coeffs = embedding.encode_to_coeffs(z, 2.0 ** 40, ctx)
    for r in (1, 5):
        g = ctx.galois_elt_from_step(r)
        src, sign = nttmod.galois_coeff_maps(ctx.n, g)
        rotated = coeffs[src] * sign
        res = embedding.coeffs_to_rns(rotated, ctx, (0,))
        back = embedding.decode(res, 2.0 ** 40, ctx, (0,))
        assert np.allclose(back, np.roll(z, -r), atol=1e-8), r


def test_encrypt_decrypt_sym_and_asym(setup):
    ctx, ev, enc, dec = setup
    rng = np.random.default_rng(2)
    z = rand_vec(rng)
    pt = ev.make_plain(z, ctx.params.scale, 3)
    for ct in (enc.encrypt_symmetric(pt), enc.encrypt_asymmetric(pt)):
        back = dec.decrypt(ct)
        assert np.allclose(back, z, atol=1e-6)


def test_add_sub_plain_const(setup):
    ctx, ev, enc, dec = setup
    rng = np.random.default_rng(3)
    x, y = rand_vec(rng), rand_vec(rng)
    sc = ctx.params.scale
    cx = enc.encrypt_symmetric(ev.make_plain(x, sc, 3))
    cy = enc.encrypt_symmetric(ev.make_plain(y, sc, 3))
    assert np.allclose(dec.decrypt(ev.add(cx, cy)), x + y, atol=1e-6)
    assert np.allclose(dec.decrypt(ev.sub(cx, cy)), x - y, atol=1e-6)
    py = ev.make_plain(y, sc, 3)
    assert np.allclose(dec.decrypt(ev.add_plain(cx, py)), x + y, atol=1e-6)
    assert np.allclose(dec.decrypt(ev.add_const(cx, 0.25)), x + 0.25, atol=1e-6)
    c2 = ev.mul_const_int(cx, 3)
    assert np.allclose(dec.decrypt(c2), 3 * x, atol=1e-5)


def test_mul_plain_and_rescale(setup):
    ctx, ev, enc, dec = setup
    rng = np.random.default_rng(4)
    x, w = rand_vec(rng), rand_vec(rng)
    sc = ctx.params.scale
    cx = enc.encrypt_symmetric(ev.make_plain(x, sc, 3))
    out = ev.mul_plain(cx, ev.make_plain(w, sc, 3))
    assert out.scale == sc * sc
    out = ev.rescale(out)
    assert out.level == 2
    assert np.allclose(dec.decrypt(out), x * w, atol=1e-5)


def test_multiply_relin_rescale(setup):
    ctx, ev, enc, dec = setup
    rng = np.random.default_rng(5)
    x, y = rand_vec(rng), rand_vec(rng)
    sc = ctx.params.scale
    cx = enc.encrypt_symmetric(ev.make_plain(x, sc, 3))
    cy = enc.encrypt_symmetric(ev.make_plain(y, sc, 3))
    prod = ev.rescale(ev.multiply(cx, cy))
    assert np.allclose(dec.decrypt(prod), x * y, atol=1e-4)
    # No-relin path decrypts correctly with 3 components.
    prod3 = ev.multiply(cx, cy, relin=False)
    assert prod3.k == 3
    assert np.allclose(dec.decrypt(ev.rescale(prod3)), x * y, atol=1e-4)


def test_rotate_and_conjugate(setup):
    ctx, ev, enc, dec = setup
    rng = np.random.default_rng(6)
    z = rand_vec(rng)
    sc = ctx.params.scale
    ct = enc.encrypt_symmetric(ev.make_plain(z, sc, 3))
    for r in (1, 3, 5):
        got = dec.decrypt(ev.rotate(ct, r))
        assert np.allclose(got, np.roll(z, -r), atol=1e-5), r
    got = dec.decrypt(ev.conjugate(ct))
    assert np.allclose(got, np.conj(z), atol=1e-5)


def test_reduced_error_add_across_levels(setup):
    ctx, ev, enc, dec = setup
    rng = np.random.default_rng(7)
    x, y = rand_vec(rng), rand_vec(rng)
    sc = ctx.params.scale
    cx = enc.encrypt_symmetric(ev.make_plain(x, sc, 3))
    cy = enc.encrypt_symmetric(ev.make_plain(y, sc, 3))
    # Push cx down a level with a different scale.
    cx2 = ev.rescale(ev.mul_plain(cx, ev.make_plain(np.ones(SLOTS), sc, 3)))
    out = ev.add_reduced_error(cx2, cy)
    assert np.allclose(dec.decrypt(out), x + y, atol=1e-3)


def test_sparse_slot_encode_decode(setup):
    ctx, ev, enc, dec = setup
    rng = np.random.default_rng(8)
    ns = SLOTS // 4
    z = rng.uniform(-1, 1, ns)
    pt = ev.make_plain(z, ctx.params.scale, 3)
    ct = enc.encrypt_symmetric(pt)
    back = dec.decrypt(ct, num_slots=ns)
    assert back.shape == (ns,)
    assert np.allclose(back, z, atol=1e-6)


def test_fake_bootstrap_roundtrip(setup):
    ctx, ev, enc, dec = setup
    rng = np.random.default_rng(9)
    z = rand_vec(rng)
    sc = ctx.params.scale
    ct = enc.encrypt_symmetric(ev.make_plain(z, sc, 1))
    assert ct.level == 1
    ct2 = fake_bootstrap(ct, dec, enc, ev, target_level=3)
    assert ct2.level == 3
    assert np.allclose(dec.decrypt(ct2), z, atol=1e-5)


def test_rotate_hoisted_matches_rotate(setup):
    ctx, ev, enc, dec = setup
    rng = np.random.default_rng(10)
    z = rand_vec(rng)
    ct = enc.encrypt_symmetric(ev.make_plain(z, ctx.params.scale, 3))
    outs = ev.rotate_hoisted(ct, [0, 1, 3, 5])
    for r, o in zip([0, 1, 3, 5], outs):
        got = dec.decrypt(o)
        assert np.allclose(got, np.roll(z, -r), atol=1e-5), r


@pytest.mark.parametrize("nsp", [2, 3])
def test_multi_special_dnum(nsp):
    """Hybrid key switching with alpha = num_special limbs per digit
    (the reference is alpha=1 only; this is the dnum generalization).
    Covers mult+relin, rotation, hoisted rotation, pk encryption, and a
    partial trailing digit group (level not a multiple of alpha)."""
    params = CkksParams.create(
        logn=LOGN, log_q0=50, log_scale=40, num_levels=5,
        log_special=51, num_special=nsp, hamming_weight=16)
    ctx = CkksContext(params)
    assert ctx.alpha == nsp and ctx.num_digits(5) == -(-5 // nsp)
    kg = KeyGenerator(ctx, seed=13)
    ev = Evaluator(ctx, relin_key=kg.relin_key(),
                   galois_keys=kg.galois_keys(steps=[1, 3]))
    enc = Encryptor(ctx, secret=kg.secret, public=kg.public_key(), seed=17)
    dec = Decryptor(ctx, kg.secret)
    rng = np.random.default_rng(19)
    z = rng.uniform(-1, 1, SLOTS)
    sc = params.scale
    ct = enc.encrypt_symmetric(ev.make_plain(z, sc, 5))
    out = ev.rescale(ev.multiply(ct, ct))
    assert np.allclose(dec.decrypt(out), z * z, atol=1e-6)
    # level 3: trailing partial digit group when nsp=2
    ct3 = ev.mod_switch_to(ct, 3)
    rot = ev.rotate(ct3, 3)
    assert np.allclose(dec.decrypt(rot), np.roll(z, -3), atol=1e-6)
    h1, h3 = ev.rotate_hoisted(ct3, [1, 3])
    assert np.allclose(dec.decrypt(h1), np.roll(z, -1), atol=1e-6)
    assert np.allclose(dec.decrypt(h3), np.roll(z, -3), atol=1e-6)
    ct_pk = enc.encrypt(ev.make_plain(z, sc, 4))
    assert np.allclose(dec.decrypt(ct_pk), z, atol=1e-6)


def test_csprng_backed_keygen():
    """SHAKE-256 CSPRNG sampling (randomgen.cpp posture): deterministic for a
    fixed seed, exact hamming weight, and a working encrypt/decrypt flow."""
    from fhe_gpt2_tpu.core.csprng import ShakeRng
    from fhe_gpt2_tpu.core.keys import KeyGenerator

    r1, r2 = ShakeRng(seed=42), ShakeRng(seed=42)
    assert np.array_equal(r1.integers(1000, size=64), r2.integers(1000, size=64))
    assert np.array_equal(r1.choice(256, 32), r2.choice(256, 32))
    z = ShakeRng(seed=7).normal(0.0, 3.2, size=4096)
    assert abs(z.mean()) < 0.3 and abs(z.std() - 3.2) < 0.3
    pick = ShakeRng(seed=9).choice(512, 64)
    assert len(set(pick.tolist())) == 64

    params = CkksParams.create(logn=9, log_q0=50, log_scale=40, num_levels=3,
                               log_special=51, hamming_weight=32)
    ctx = CkksContext(params)
    kg = KeyGenerator(ctx, rng=ShakeRng(seed=1))
    assert int(np.count_nonzero(kg.secret.coeffs)) == 32
    ev = Evaluator(ctx, relin_key=kg.relin_key())
    enc = Encryptor(ctx, secret=kg.secret, rng=ShakeRng(seed=2))
    dec = Decryptor(ctx, kg.secret)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, ctx.params.slots)
    ct = enc.encrypt(ev.make_plain(x, params.scale, 3))
    out = ev.rescale(ev.multiply(ct, ct))
    assert np.abs(np.real(dec.decrypt(out)) - x * x).max() < 1e-6


def test_multi_hop_rotation_digit_keys():
    """Rotations with only a base-4 digit key set: every path (plain rotate,
    hoisted, double-hoisted ext) must match single-step semantics
    (memory_save_rotate parity, cnn_seal.cpp:788-810)."""
    from fhe_gpt2_tpu.core.keys import KeyGenerator, digit_steps

    params = CkksParams.create(logn=9, log_q0=50, log_scale=40, num_levels=4,
                               log_special=51, hamming_weight=32)
    ctx = CkksContext(params)
    slots = ctx.params.slots
    kg = KeyGenerator(ctx, seed=11)
    dsteps = digit_steps(slots, base=4)
    ev = Evaluator(ctx, relin_key=kg.relin_key(),
                   galois_keys=kg.galois_keys(steps=dsteps))
    enc = Encryptor(ctx, secret=kg.secret, seed=12)
    dec = Decryptor(ctx, kg.secret)
    rng = np.random.default_rng(13)
    x = rng.uniform(-1, 1, slots)
    ct = enc.encrypt(ev.make_plain(x, params.scale, 4))

    for s in (1, 7, 30, 123, 255):
        got = np.real(dec.decrypt(ev.rotate(ct, s)))
        assert np.abs(got - np.roll(x, -s)).max() < 1e-5, s

    outs = ev.rotate_hoisted(ct, [3, 21, 64, 130])
    for s, o in zip([3, 21, 64, 130], outs):
        got = np.real(dec.decrypt(o))
        assert np.abs(got - np.roll(x, -s)).max() < 1e-5, ("hoisted", s)

    # Double-hoisted ext path with a mask-sum over mixed single/multi-hop.
    from fhe_gpt2_tpu.nn.backend import CkksBackend
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=dec, default_level=4)
    exts = B.lt_hoist_ext([ct], {0: [2, 37]})
    masks = [np.ones(slots) * 0.5, np.ones(slots) * 0.25]
    out = B.lt_mask_sum_ext([exts[(0, 2)], exts[(0, 37)]], masks)
    want = 0.5 * np.roll(x, -2) + 0.25 * np.roll(x, -37)
    assert np.abs(np.real(dec.decrypt(out)) - want).max() < 1e-5
