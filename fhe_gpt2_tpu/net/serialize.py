"""Serialization for ciphertexts, keys, and parameters.

Counterpart of the reference's SEAL serialization + network_util helpers
(serialization.cpp, util/ztools.cpp zlib streams; network/header/
network_util.h:49-57): little-endian numpy buffers with a JSON header,
zlib-compressed through the native runtime (falls back to zlib module).
"""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np

from ..core.context import CkksParams
from ..core.evaluator import Ciphertext, Plaintext
from ..core.keys import GaloisKeys, KSwitchKey
from ..runtime import native

MAGIC = b"CKTP"


def _compress(b: bytes) -> bytes:
    return native.compress(b) if native.available() else zlib.compress(b)


def _decompress(b: bytes, n: int) -> bytes:
    return native.decompress(b, n) if native.available() else zlib.decompress(b)


def _pack(header: dict, payload: bytes) -> bytes:
    h = json.dumps(header).encode()
    comp = _compress(payload)
    return MAGIC + struct.pack("<III", len(h), len(comp), len(payload)) + h + comp


def _unpack(blob: bytes) -> tuple[dict, bytes]:
    assert blob[:4] == MAGIC, "bad magic"
    hlen, clen, rlen = struct.unpack("<III", blob[4:16])
    header = json.loads(blob[16:16 + hlen].decode())
    payload = _decompress(blob[16 + hlen:16 + hlen + clen], rlen)
    return header, payload


def dump_ciphertext(ct: Ciphertext) -> bytes:
    arr = np.asarray(ct.data)
    return _pack({"kind": "ct", "scale": ct.scale, "shape": list(arr.shape),
                  "dtype": arr.dtype.name},
                 arr.tobytes())


def load_ciphertext(blob: bytes) -> Ciphertext:
    import jax.numpy as jnp
    h, payload = _unpack(blob)
    assert h["kind"] == "ct"
    arr = np.frombuffer(payload, dtype=h.get("dtype", "uint64")).reshape(
        h["shape"])
    return Ciphertext(jnp.asarray(arr), h["scale"])


def dump_ciphertext_seeded(ct: Ciphertext, seed: bytes) -> bytes:
    """Seeded fresh-ciphertext form (serialization.cpp seeded save): only c0
    travels; c1 is regenerated from the 32-byte SHAKE seed at load. Halves
    the wire size of fresh symmetric ciphertexts (before zlib)."""
    arr = np.asarray(ct.data)
    assert arr.shape[0] == 2, "seeded form is for fresh (k=2) ciphertexts"
    return _pack({"kind": "ct_seeded", "scale": ct.scale,
                  "shape": list(arr.shape), "dtype": arr.dtype.name,
                  "seed": seed.hex()},
                 arr[0].tobytes())


def load_ciphertext_seeded(blob: bytes, ctx) -> Ciphertext:
    import jax.numpy as jnp
    from ..core.evaluator import expand_uniform
    h, payload = _unpack(blob)
    assert h["kind"] == "ct_seeded"
    shape = h["shape"]
    c0 = np.frombuffer(payload, dtype=h.get("dtype", "uint64")).reshape(
        shape[1:])
    l = shape[-2]
    mods = [ctx.all_moduli[i] for i in range(l)]
    c1 = expand_uniform(bytes.fromhex(h["seed"]), ctx.n, mods, ctx.word)
    return Ciphertext(jnp.asarray(np.stack([c0, c1])), h["scale"])


def dump_kswitch_key(k: KSwitchKey) -> bytes:
    arr = np.asarray(k.data)
    return _pack({"kind": "ksk", "shape": list(arr.shape),
                  "dtype": arr.dtype.name}, arr.tobytes())


def load_kswitch_key(blob: bytes) -> KSwitchKey:
    import jax.numpy as jnp
    h, payload = _unpack(blob)
    assert h["kind"] == "ksk"
    return KSwitchKey(jnp.asarray(np.frombuffer(
        payload, dtype=h.get("dtype", "uint64")).reshape(h["shape"])))


def dump_galois_elt(elt: int, k: KSwitchKey) -> bytes:
    """One Galois key as its own frame (streaming upload granularity)."""
    arr = np.asarray(k.data)
    return _pack({"kind": "gal_elt", "elt": int(elt),
                  "shape": list(arr.shape), "dtype": arr.dtype.name},
                 arr.tobytes())


def load_galois_elt(blob: bytes) -> tuple[int, KSwitchKey]:
    import jax.numpy as jnp
    h, payload = _unpack(blob)
    assert h["kind"] == "gal_elt"
    return h["elt"], KSwitchKey(jnp.asarray(np.frombuffer(
        payload, dtype=h.get("dtype", "uint64")).reshape(h["shape"])))


def peek_kind(blob: bytes) -> str:
    assert blob[:4] == MAGIC, "bad magic"
    hlen, _, _ = struct.unpack("<III", blob[4:16])
    return json.loads(blob[16:16 + hlen].decode())["kind"]


def dump_galois_keys(gk: GaloisKeys) -> bytes:
    elts = sorted(gk.keys)
    blobs = [dump_kswitch_key(gk.keys[e]) for e in elts]
    header = {"kind": "galois", "elts": elts, "sizes": [len(b) for b in blobs]}
    return _pack(header, b"".join(blobs))


def load_galois_keys(blob: bytes) -> GaloisKeys:
    h, payload = _unpack(blob)
    assert h["kind"] == "galois"
    gk = GaloisKeys()
    off = 0
    for e, sz in zip(h["elts"], h["sizes"]):
        gk.keys[e] = load_kswitch_key(payload[off:off + sz])
        off += sz
    return gk


def dump_params(p: CkksParams) -> bytes:
    return _pack({"kind": "params", "n": p.n, "moduli": list(p.moduli),
                  "special": list(p.special), "scale": p.scale,
                  "hamming_weight": p.hamming_weight,
                  "sparse_slots": p.sparse_slots,
                  "rescale_limbs": p.rescale_limbs,
                  "base_limbs": p.base_limbs}, b"")


def load_params(blob: bytes) -> CkksParams:
    h, _ = _unpack(blob)
    assert h["kind"] == "params"
    return CkksParams(n=h["n"], moduli=tuple(h["moduli"]),
                      special=tuple(h["special"]), scale=h["scale"],
                      hamming_weight=h["hamming_weight"],
                      sparse_slots=h["sparse_slots"],
                      rescale_limbs=h.get("rescale_limbs", 1),
                      base_limbs=h.get("base_limbs", 1))
