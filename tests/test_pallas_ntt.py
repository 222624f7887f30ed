"""Golden tests: the Pallas four-step NTT (core/tntt.py) must be bit-exact
against the XLA stage network (core/ntt.py), which itself is golden-tested
against a Python-int oracle in test_ntt.py.

On this CPU test host the kernels run in Pallas interpret mode; on TPU the
same code paths are exercised by bench.py and the encrypted E2E drivers.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_gpt2_tpu.core import ntt as nttmod
from fhe_gpt2_tpu.core import primes, tntt


@pytest.fixture(scope="module")
def tables():
    n = 2048
    mods = primes.gen_primes_balanced(25, 3, 2 * n)
    return nttmod.make_ntt_tables(mods, n, fourstep=True)


def _rand(tables, shape_prefix=()):
    rng = np.random.default_rng(7)
    n = tables.n
    cols = [
        rng.integers(0, q, size=shape_prefix + (n,), dtype=np.uint64)
        .astype(np.uint32)
        for q in tables.moduli
    ]
    return np.stack(cols, axis=-2 if shape_prefix else 0).reshape(
        *shape_prefix, len(tables.moduli), n)


def test_forward_bit_exact(tables):
    x = jnp.asarray(_rand(tables))
    ref = np.asarray(nttmod._ntt_stages(x, tables))
    got = np.asarray(tntt.fourstep_ntt(x, tables.fs, interpret=True))
    assert np.array_equal(ref, got)


def test_inverse_bit_exact_and_roundtrip(tables):
    x = jnp.asarray(_rand(tables))
    f = nttmod._ntt_stages(x, tables)
    ref = np.asarray(nttmod._intt_stages(f, tables))
    got = np.asarray(tntt.fourstep_intt(f, tables.fs, interpret=True))
    assert np.array_equal(ref, got)
    assert np.array_equal(got, np.asarray(x))


def test_batched_dims(tables):
    """Leading batch dims (ciphertext components / digits) flatten into the
    kernel grid."""
    x = jnp.asarray(_rand(tables, shape_prefix=(2, 3)))
    ref = np.asarray(nttmod._ntt_stages(x, tables))
    got = np.asarray(tntt.fourstep_ntt(x, tables.fs, interpret=True))
    assert np.array_equal(ref, got)


def test_limb_slice(tables):
    """slice() carries the four-step tables; a sliced transform matches the
    corresponding limbs of the full one."""
    sub = tables.slice([0, 2])
    assert sub.fs is not None
    x = _rand(tables)
    xs = jnp.asarray(x[[0, 2]])
    ref = np.asarray(nttmod._ntt_stages(xs, sub))
    got = np.asarray(tntt.fourstep_ntt(xs, sub.fs, interpret=True))
    assert np.array_equal(ref, got)


@pytest.mark.slow
def test_r512_logn16_bit_exact():
    """The logN=16 configuration (R=512 rows — the reference's production
    ring, infer_seal.cpp:287) was previously untested: pin forward
    bit-exactness + inverse roundtrip at N=2^16."""
    n = 1 << 16
    mods = primes.gen_primes_balanced(25, 2, 2 * n)
    t = nttmod.make_ntt_tables(mods, n, fourstep=True)
    rng = np.random.default_rng(7)
    x = jnp.asarray(np.stack(
        [rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
         for q in mods]))
    ref = np.asarray(nttmod._ntt_stages(x, t))
    got = np.asarray(tntt.fourstep_ntt(x, t.fs, interpret=True))
    assert np.array_equal(ref, got)
    back = np.asarray(tntt.fourstep_intt(jnp.asarray(ref), t.fs,
                                         interpret=True))
    assert np.array_equal(back, np.asarray(x))
