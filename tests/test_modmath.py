"""Golden tests for the u64 modular-arithmetic layer vs Python big ints."""

import numpy as np
import jax.numpy as jnp

from fhe_gpt2_tpu.core import modmath as mm
from fhe_gpt2_tpu.core import primes


def _rand_u64(rng, shape, below):
    return rng.integers(0, below, size=shape, dtype=np.uint64)


def test_mulhi_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 63, size=256, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 1 << 63, size=256, dtype=np.uint64)
    hi = np.asarray(mm.mulhi(jnp.asarray(a), jnp.asarray(b)))
    for i in range(len(a)):
        assert int(hi[i]) == (int(a[i]) * int(b[i])) >> 64


def test_mul_mod_barrett_vs_bigint():
    rng = np.random.default_rng(1)
    for bits in (30, 45, 51, 60, 61):
        q = primes.gen_primes(bits, 1, 2 * 64)[0]
        r0, r1 = mm.barrett_ratio(q)
        a = _rand_u64(rng, 1024, q)
        b = _rand_u64(rng, 1024, q)
        got = np.asarray(
            mm.mul_mod(
                jnp.asarray(a), jnp.asarray(b),
                jnp.uint64(q), jnp.uint64(r0), jnp.uint64(r1),
            )
        )
        want = (a.astype(object) * b.astype(object)) % q
        assert (got.astype(object) == want).all(), bits


def test_barrett_reduce_64():
    rng = np.random.default_rng(2)
    q = primes.gen_primes(50, 1, 2 * 64)[0]
    _, r1 = mm.barrett_ratio(q)
    a = rng.integers(0, 1 << 63, size=512, dtype=np.uint64)
    got = np.asarray(mm.barrett_reduce(jnp.asarray(a), jnp.uint64(q), jnp.uint64(r1)))
    assert (got.astype(object) == a.astype(object) % q).all()


def test_shoup_mul():
    rng = np.random.default_rng(3)
    q = primes.gen_primes(59, 1, 2 * 128)[0]
    w = int(rng.integers(1, q))
    ws = mm.shoup(w, q)
    a = _rand_u64(rng, 2048, q)
    got = np.asarray(
        mm.mul_mod_shoup(jnp.asarray(a), jnp.uint64(w), jnp.uint64(ws), jnp.uint64(q))
    )
    want = (a.astype(object) * w) % q
    assert (got.astype(object) == want).all()


def test_add_sub_neg():
    rng = np.random.default_rng(4)
    q = primes.gen_primes(61, 1, 2 * 64)[0]
    a = _rand_u64(rng, 512, q)
    b = _rand_u64(rng, 512, q)
    qq = jnp.uint64(q)
    assert (np.asarray(mm.add_mod(jnp.asarray(a), jnp.asarray(b), qq)).astype(object)
            == (a.astype(object) + b.astype(object)) % q).all()
    assert (np.asarray(mm.sub_mod(jnp.asarray(a), jnp.asarray(b), qq)).astype(object)
            == (a.astype(object) - b.astype(object)) % q).all()
    assert (np.asarray(mm.neg_mod(jnp.asarray(a), qq)).astype(object)
            == (-a.astype(object)) % q).all()
