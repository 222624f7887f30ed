"""NTT golden tests: round-trip, convolution theorem, orderings, Galois maps."""

import numpy as np
import jax.numpy as jnp

from fhe_gpt2_tpu.core import ntt as nttmod
from fhe_gpt2_tpu.core import primes


def _setup(n, bits=50, nlimbs=2):
    mods = primes.gen_primes(bits, nlimbs, 2 * n)
    return mods, nttmod.make_ntt_tables(mods, n)


def test_roundtrip():
    n = 64
    mods, tables = _setup(n, nlimbs=3)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in mods])
    y = nttmod.intt(nttmod.ntt(jnp.asarray(x), tables), tables)
    assert (np.asarray(y) == x).all()


def test_matches_host_oracle():
    n = 32
    mods, tables = _setup(n, nlimbs=2)
    rng = np.random.default_rng(1)
    x = np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in mods])
    y = np.asarray(nttmod.ntt(jnp.asarray(x), tables))
    for li, q in enumerate(mods):
        want = nttmod.host_ntt([int(v) for v in x[li]], q, tables.psi[li])
        assert [int(v) for v in y[li]] == want


def test_negacyclic_convolution():
    """NTT(a) ⊙ NTT(b) == NTT(a *_neg b) where *_neg is X^n+1 convolution."""
    n = 32
    mods, tables = _setup(n, nlimbs=1)
    q = mods[0]
    rng = np.random.default_rng(2)
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    b = rng.integers(0, q, size=n, dtype=np.uint64)
    # Schoolbook negacyclic product.
    c = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            t = int(a[i]) * int(b[j]) % q
            if k < n:
                c[k] = (c[k] + t) % q
            else:
                c[k - n] = (c[k - n] - t) % q
    fa = nttmod.ntt(jnp.asarray(a[None, :]), tables)
    fb = nttmod.ntt(jnp.asarray(b[None, :]), tables)
    from fhe_gpt2_tpu.core.modmath import mul_mod
    prod = mul_mod(fa, fb, tables.q, tables.ratio0, tables.ratio1)
    got = np.asarray(nttmod.intt(prod, tables))[0]
    assert [int(v) for v in got] == c


def test_point_exponents_formula():
    """Analytical slot->evaluation-point map matches direct evaluation."""
    for n in (8, 16, 64):
        mods, tables = _setup(n, nlimbs=1)
        q = mods[0]
        psi = tables.psi[0]
        e = nttmod.point_exponents(n)
        # NTT of the monomial X: slot j must hold psi^{e[j]}.
        x = np.zeros((1, n), dtype=np.uint64)
        x[0, 1] = 1
        y = np.asarray(nttmod.ntt(jnp.asarray(x), tables))[0]
        for j in range(n):
            assert int(y[j]) == pow(psi, int(e[j]), q), (n, j)


def test_galois_ntt_permutation():
    """NTT-domain permutation == coeff-domain automorphism + NTT."""
    n = 32
    mods, tables = _setup(n, nlimbs=1)
    q = mods[0]
    rng = np.random.default_rng(3)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    for g in (3, 9, 2 * n - 1, pow(3, 5, 2 * n)):
        # Coefficient-domain: out[i*g mod 2n] = ±x[i]
        src, sign = nttmod.galois_coeff_maps(n, g)
        auto = np.array(
            [int(x[src[j]]) * int(sign[j]) % q for j in range(n)], dtype=np.uint64
        )
        want = np.asarray(nttmod.ntt(jnp.asarray(auto[None]), tables))[0]
        perm = nttmod.galois_ntt_permutation(n, g)
        got = np.asarray(nttmod.ntt(jnp.asarray(x[None]), tables))[0][perm]
        assert (got == want).all(), g


def test_batched_leading_dims():
    n = 16
    mods, tables = _setup(n, nlimbs=2)
    rng = np.random.default_rng(4)
    x = np.stack(
        [
            np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in mods])
            for _ in range(3)
        ]
    )  # [3, L, n]
    y = nttmod.ntt(jnp.asarray(x), tables)
    for b in range(3):
        yb = nttmod.ntt(jnp.asarray(x[b]), tables)
        assert (np.asarray(y[b]) == np.asarray(yb)).all()
    back = nttmod.intt(y, tables)
    assert (np.asarray(back) == x).all()
