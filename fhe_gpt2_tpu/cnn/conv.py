"""Encrypted CNN kernels: convolution, batch-norm folding, pooling, FC.

Counterpart of the reference's multiplexed-packed CNN layer
(cnn_ckks/.../cnn/cnn_seal.cpp: multiplexed_parallel_convolution_seal :284,
batch_norm :531, downsampling :610, averagepooling :680, FC :747) —
TPU-first redesign:

  * Tensors use a channel-major planar layout (slot = c·H·W + y·W + x);
    batches of images ride the ciphertext batch axis instead of the
    reference's OpenMP-over-images.
  * Convolution/pooling/FC are slot-linear maps built analytically as LT
    specs and evaluated with the shared BSGS engine; zero-padding falls out
    of the diagonal masks (no explicit select_one masking pass).
  * BatchNorm is folded into the adjacent conv's weights host-side (the
    reference fuses BN scaling into select_one masks, cnn_seal.cpp:373-400).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..nn.linear import LTSpec, lt_from_triples


@dataclass(frozen=True)
class PlanarLayout:
    """Channel-major planar tensor packing: slot = c·H·W + y·W + x."""

    c: int
    h: int
    w: int
    slots: int

    @property
    def size(self) -> int:
        return self.c * self.h * self.w

    @property
    def n_cts(self) -> int:
        return -(-self.size // self.slots)

    def place(self, c, y, x):
        g = (c * self.h + y) * self.w + x
        return g // self.slots, g % self.slots

    def pack(self, t: np.ndarray) -> np.ndarray:
        assert t.shape == (self.c, self.h, self.w)
        flat = np.zeros(self.n_cts * self.slots)
        flat[: self.size] = t.ravel()
        return flat.reshape(self.n_cts, self.slots)

    def unpack(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(x).ravel()[: self.size].reshape(self.c, self.h, self.w)


def conv2d_spec(weights: np.ndarray, lin: PlanarLayout, lout: PlanarLayout,
                stride: int = 1, name: str = "conv") -> LTSpec:
    """SAME-padded 2D convolution as an LT spec.

    weights: [co, ci, kh, kw]. Output (co, y, x) = Σ w·in(ci, s·y+dy, s·x+dx)
    with dy/dx centered. Out-of-range taps are simply absent from the
    diagonal masks (zero padding for free).
    """
    co_n, ci_n, kh, kw = weights.shape
    assert lin.c == ci_n and lout.c == co_n
    oy, ox = np.meshgrid(np.arange(lout.h), np.arange(lout.w), indexing="ij")
    oy, ox = oy.ravel(), ox.ravel()
    trips = {k: [] for k in ("dct", "dsl", "sct", "ssl", "w")}
    co_g = np.arange(co_n)[:, None, None]          # [co, 1, 1]
    ci_g = np.arange(ci_n)[None, :, None]          # [1, ci, 1]
    for dy in range(kh):
        for dx in range(kw):
            iy = stride * oy + dy - kh // 2
            ix = stride * ox + dx - kw // 2
            ok = (iy >= 0) & (iy < lin.h) & (ix >= 0) & (ix < lin.w)
            if not ok.any():
                continue
            oyk, oxk, iyk, ixk = oy[ok], ox[ok], iy[ok], ix[ok]
            # Vectorized over (co, ci, positions).
            shape = (co_n, ci_n, len(oyk))
            dct, dsl = lout.place(co_g, oyk[None, None, :], oxk[None, None, :])
            sct, ssl = lin.place(ci_g, iyk[None, None, :], ixk[None, None, :])
            w = np.broadcast_to(weights[:, :, dy, dx, None], shape)
            trips["dct"].append(np.broadcast_to(dct, shape).ravel())
            trips["dsl"].append(np.broadcast_to(dsl, shape).ravel())
            trips["sct"].append(np.broadcast_to(sct, shape).ravel())
            trips["ssl"].append(np.broadcast_to(ssl, shape).ravel())
            trips["w"].append(w.ravel())
    w_all = np.concatenate(trips["w"])
    nz = w_all != 0.0
    return lt_from_triples(
        lin.slots, lin.n_cts, lout.n_cts,
        np.concatenate(trips["dct"])[nz], np.concatenate(trips["dsl"])[nz],
        np.concatenate(trips["sct"])[nz], np.concatenate(trips["ssl"])[nz],
        w_all[nz], name)


def avgpool_spec(lin: PlanarLayout, slots: int, name: str = "avgpool") -> LTSpec:
    """Global average pool: (c, h, w) -> vector of c at slots [0, c)."""
    c, y, x = np.meshgrid(np.arange(lin.c), np.arange(lin.h),
                          np.arange(lin.w), indexing="ij")
    c, y, x = c.ravel(), y.ravel(), x.ravel()
    sct, ssl = lin.place(c, y, x)
    w = np.full(c.shape, 1.0 / (lin.h * lin.w))
    return lt_from_triples(slots, lin.n_cts, 1, np.zeros_like(c), c,
                           np.broadcast_to(sct, c.shape), ssl, w, name)


def fc_spec(weights: np.ndarray, bias_dim_in: int, slots: int,
            name: str = "fc") -> LTSpec:
    """Fully-connected [d_in, d_out] on a vector packed at slots [0, d_in)."""
    d_in, d_out = weights.shape
    k, c = np.meshgrid(np.arange(d_in), np.arange(d_out), indexing="ij")
    k, c = k.ravel(), c.ravel()
    return lt_from_triples(slots, 1, 1, np.zeros_like(c), c,
                           np.zeros_like(k), k, weights[k, c], name)


def fold_bn(weights: np.ndarray, bias: np.ndarray, gamma, beta, mean, var,
            eps: float = 1e-5):
    """Fold BatchNorm into the preceding conv: returns (w', b').

    w'[co] = w[co]·γ/√(σ²+ε), b' = (b − μ)·γ/√(σ²+ε) + β — replaces the
    reference's multiplexed_parallel_batch_norm_seal pass entirely.
    """
    scale = np.asarray(gamma) / np.sqrt(np.asarray(var) + eps)
    w = weights * scale[:, None, None, None]
    b = (np.asarray(bias) - np.asarray(mean)) * scale + np.asarray(beta)
    return w, b


def bias_vector(lout: PlanarLayout, bias: np.ndarray) -> np.ndarray:
    """Per-channel bias replicated over spatial slots."""
    t = np.broadcast_to(np.asarray(bias)[:, None, None],
                        (lout.c, lout.h, lout.w))
    return lout.pack(t)
