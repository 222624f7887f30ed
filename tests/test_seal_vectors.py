"""Bit-exact cross-validation against the vendored modified SEAL 3.6.6.

Golden vectors (tests/data/seal_vectors.bin) were extracted by building the
reference's seal-modified-3.6.6 tree and dumping coefficient-domain RNS
arrays for: a sparse-secret keygen (h=64), CKKS encode, symmetric encrypt,
square+relinearize+rescale, and rotate-by-1 — covering BASELINE config 2
("bit-exact vs modified-SEAL vectors") / SURVEY §7 step 2.

Coefficient-domain dumps make the comparison independent of each side's NTT
point ordering: we re-NTT with our own tables, run OUR evaluator ops with
SEAL's keys, and compare results back in the coefficient domain.

Regenerating: build seal-modified-3.6.6 (SEAL_USE_INTEL_HEXL=OFF) and run
the dump driver (name/ndim/dims/u64-data records; see _load below).
"""

import os
import struct

import numpy as np
import pytest

from fhe_gpt2_tpu.core import ntt as nttmod
from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
from fhe_gpt2_tpu.core.evaluator import Ciphertext, Decryptor, Evaluator
from fhe_gpt2_tpu.core.keys import GaloisKeys, KSwitchKey, SecretKey

VEC = os.path.join(os.path.dirname(__file__), "data", "seal_vectors.bin")


def _load(path):
    out = {}
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        (nl,) = struct.unpack_from("<I", data, off)
        off += 4
        name = data[off:off + nl].decode()
        off += nl
        (nd,) = struct.unpack_from("<I", data, off)
        off += 4
        dims = struct.unpack_from(f"<{nd}Q", data, off)
        off += 8 * nd
        total = int(np.prod(dims))
        arr = np.frombuffer(data, dtype="<u8", count=total, offset=off)
        off += 8 * total
        out[name] = arr.reshape(dims)
    return out


@pytest.fixture(scope="module")
def seal():
    v = _load(VEC)
    mods = [int(m) for m in v["moduli_all"]]
    params = CkksParams(n=8192, moduli=tuple(mods[:-1]),
                        special=(mods[-1],), scale=2.0 ** 40,
                        hamming_weight=64, sparse_slots=0)
    ctx = CkksContext(params)

    def to_ntt(arr, limbs):
        import jax.numpy as jnp
        t = ctx.tables(limbs)
        return nttmod.ntt(jnp.asarray(arr), t)

    key_limbs = tuple(range(len(mods)))
    sk = SecretKey(ntt=to_ntt(v["secret"], key_limbs), coeffs=None)

    def load_ksk(prefix):
        D = int(v[f"{prefix}_digits"][0])
        digs = []
        for i in range(D):
            cs = [to_ntt(v[f"{prefix}_d{i}_c{j}"], key_limbs)
                  for j in range(2)]
            digs.append(np.stack([np.asarray(c) for c in cs]))
        import jax.numpy as jnp
        return KSwitchKey(data=jnp.asarray(np.stack(digs)))

    relin = load_ksk("relin")
    gk = GaloisKeys()
    elt = int(v["galois_elt_step1"][0])
    gk.keys[elt] = load_ksk("galois1")
    ev = Evaluator(ctx, relin_key=relin, galois_keys=gk)
    dec = Decryptor(ctx, sk)
    L = len(mods) - 1

    def load_ct(prefix, limbs):
        cs = np.stack([np.asarray(to_ntt(v[f"{prefix}_c{j}"],
                                         tuple(range(limbs))))
                       for j in range(2)])
        scale = float(np.frombuffer(
            v[f"{prefix}_scale"].tobytes(), dtype=np.float64)[0])
        import jax.numpy as jnp
        return Ciphertext(jnp.asarray(cs), scale)

    return v, ctx, ev, dec, load_ct, L


def _to_coeff(ctx, data, limbs):
    t = ctx.tables(tuple(range(limbs)))
    return np.asarray(nttmod.intt(data, t))


def test_galois_elt_convention(seal):
    v, ctx, *_ = seal
    assert ctx.galois_elt_from_step(1) == int(v["galois_elt_step1"][0])


def test_decode_matches_encoded_values(seal):
    """Our decode of SEAL's fresh ciphertext recovers the encoded vector."""
    v, ctx, ev, dec, load_ct, L = seal
    ct = load_ct("ct_in", L)
    z = dec.decrypt(ct)
    want = np.sin(0.001 * np.arange(ctx.params.slots))
    assert np.abs(np.real(z) - want).max() < 1e-6


def test_square_relin_rescale_bit_exact(seal):
    """OUR square+relin+rescale on SEAL's ciphertext with SEAL's relin key
    reproduces SEAL's output ciphertext bit-for-bit (coefficient domain)."""
    v, ctx, ev, dec, load_ct, L = seal
    ct = load_ct("ct_in", L)
    out = ev.rescale(ev.square(ct))
    got = _to_coeff(ctx, out.data, L - 1)
    want = np.stack([v["ct_sq_c0"], v["ct_sq_c1"]])
    assert np.array_equal(got, want), "square+relin+rescale differs from SEAL"
    # And the decryption path agrees bit-for-bit too.
    dec_rns = dec.decrypt_to_rns(out)
    assert np.array_equal(dec_rns, v["plain_sq"])


def test_rotate_bit_exact(seal):
    v, ctx, ev, dec, load_ct, L = seal
    ct = load_ct("ct_in", L)
    out = ev.rotate(ct, 1)
    got = _to_coeff(ctx, out.data, L)
    want = np.stack([v["ct_rot_c0"], v["ct_rot_c1"]])
    assert np.array_equal(got, want), "rotation differs from SEAL"
    dec_rns = dec.decrypt_to_rns(out)
    assert np.array_equal(dec_rns, v["plain_rot"])
