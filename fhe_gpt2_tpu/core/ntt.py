"""Negacyclic NTT over RNS limb towers, vectorized for XLA/TPU.

Counterpart of the reference's ``util/ntt.h`` (NTTTables, Harvey butterflies)
re-designed for the TPU execution model: instead of scalar butterfly loops,
every stage is a whole-array reshape + vectorized Shoup modular multiply over
``[..., L, m, 2, t]`` views — no gathers, no data-dependent control flow, and
the stage loop is unrolled at trace time (log2 N stages). XLA fuses each stage
into a handful of elementwise ops on the 128-lane axis.

Conventions:
  * ``x`` is ``uint64[..., L, N]``: arbitrary leading batch dims, limb axis
    second-to-last, coefficients last.
  * Forward transform: natural coefficient order in, "scrambled" (bit-reversed
    enumeration of ψ-powers) evaluation order out — same family of ordering as
    the reference's NTT form. The ordering is internal: dyadic ops are
    pointwise, Galois rotations use an exponent map computed for exactly this
    ordering (see ``point_exponents``), and the inverse transform restores
    natural coefficient order. Golden tests check round-trip and the
    negacyclic convolution theorem against a Python-int oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import primes
from .modmath import add_mod, sub_mod, mul_mod_shoup, shoup, word_dtype, \
    word_bits_of


def bit_reverse(x: int, bits: int) -> int:
    out = 0
    for _ in range(bits):
        out = (out << 1) | (x & 1)
        x >>= 1
    return out


_TABLE_FIELDS = (
    "q", "ratio0", "ratio1", "roots", "roots_shoup",
    "inv_roots", "inv_roots_shoup", "n_inv", "n_inv_shoup", "fs",
)


@dataclass(frozen=True)
class NttTables:
    """Per-modulus-set NTT constants, resident on device.

    Shapes: moduli/Barrett constants ``[L, 1]`` (broadcast over coefficients),
    twiddle tables ``[L, N]``. When ``fs`` is set (uint32 contexts at TPU-size
    rings), the fused Pallas four-step kernel (core/tntt.py) shadows the XLA
    stage loop; it rides the pytree so jitted programs take it as an argument.
    """

    n: int
    logn: int
    q: jnp.ndarray            # [L, 1] word dtype
    ratio0: jnp.ndarray       # [L, 1] floor(2^(2w)/q) low word
    ratio1: jnp.ndarray       # [L, 1] floor(2^(2w)/q) high word
    roots: jnp.ndarray        # [L, N] ψ^{br(i)}
    roots_shoup: jnp.ndarray
    inv_roots: jnp.ndarray    # [L, N] ψ^{-br(i)} table for inverse stages
    inv_roots_shoup: jnp.ndarray
    n_inv: jnp.ndarray        # [L, 1] N^{-1} mod q
    n_inv_shoup: jnp.ndarray
    fs: object = None         # tntt.FourStep | None (Pallas fast path)
    # Host-side metadata (hashable statics; not traced)
    moduli: tuple = field(default_factory=tuple)
    psi: tuple = field(default_factory=tuple)

    def slice(self, idx: list[int]) -> "NttTables":
        """Tables restricted to a static subset of limbs (e.g. current level).

        Slices via host numpy so the result is concrete even when called
        inside a trace (eval_shape/jit) — sliced tables are cached on the
        context and must never capture tracers."""
        i = np.asarray(idx)

        def s(x):
            with jax.ensure_compile_time_eval():
                return jnp.asarray(np.asarray(x)[i])

        fs = None
        if self.fs is not None:
            from .tntt import slice_fourstep
            fs = slice_fourstep(self.fs, idx)
        return NttTables(
            n=self.n, logn=self.logn,
            q=s(self.q), ratio0=s(self.ratio0), ratio1=s(self.ratio1),
            roots=s(self.roots), roots_shoup=s(self.roots_shoup),
            inv_roots=s(self.inv_roots), inv_roots_shoup=s(self.inv_roots_shoup),
            n_inv=s(self.n_inv), n_inv_shoup=s(self.n_inv_shoup),
            fs=fs,
            moduli=tuple(self.moduli[j] for j in idx),
            psi=tuple(self.psi[j] for j in idx),
        )


def _tables_flatten(t: NttTables):
    return tuple(getattr(t, f) for f in _TABLE_FIELDS), (t.n, t.logn, t.moduli, t.psi)


def _tables_unflatten(aux, children):
    n, logn, moduli, psi = aux
    kw = dict(zip(_TABLE_FIELDS, children))
    return NttTables(n=n, logn=logn, moduli=moduli, psi=psi, **kw)


jax.tree_util.register_pytree_node(NttTables, _tables_flatten, _tables_unflatten)


def make_ntt_tables(moduli: list[int], n: int,
                    fourstep: bool = False) -> NttTables:
    """Precompute twiddle tables for each modulus (host, exact Python ints).

    The word dtype (uint32/uint64) is inferred from the modulus sizes; every
    downstream op dispatches on it (see core/modmath.py). With ``fourstep``
    (uint32 chains, N >= 2048), Pallas four-step tables are attached too."""
    logn = n.bit_length() - 1
    assert 1 << logn == n
    L = len(moduli)
    dt = word_dtype(moduli)
    wb = word_bits_of(dt)
    roots = np.zeros((L, n), dtype=dt)
    roots_sh = np.zeros((L, n), dtype=dt)
    inv_roots = np.zeros((L, n), dtype=dt)
    inv_roots_sh = np.zeros((L, n), dtype=dt)
    q_arr = np.zeros((L, 1), dtype=dt)
    r0 = np.zeros((L, 1), dtype=dt)
    r1 = np.zeros((L, 1), dtype=dt)
    ninv = np.zeros((L, 1), dtype=dt)
    ninv_sh = np.zeros((L, 1), dtype=dt)
    psis = []
    for li, q in enumerate(moduli):
        psi = primes.root_of_unity(2 * n, q)
        psis.append(psi)
        inv_psi = primes.mod_inverse(psi, q)
        q_arr[li, 0] = q
        mask = (1 << wb) - 1
        rat = (1 << (2 * wb)) // q
        lo, hi = rat & mask, rat >> wb
        r0[li, 0], r1[li, 0] = lo, hi
        # Forward: roots[m+i] = psi^{br(m+i)} over logn bits; roots[0]=1.
        # Inverse: inv_roots indexed the same way with psi^{-1}.
        pw = 1
        powers = [1] * (2 * n)
        for e in range(1, 2 * n):
            pw = pw * psi % q
            powers[e] = pw
        inv_pw = 1
        inv_powers = [1] * (2 * n)
        for e in range(1, 2 * n):
            inv_pw = inv_pw * inv_psi % q
            inv_powers[e] = inv_pw
        br = np.array([bit_reverse(i, logn) for i in range(n)])
        pw = np.asarray(powers, dtype=object)[br]
        ipw = np.asarray(inv_powers, dtype=object)[br]
        roots[li] = pw.astype(dt)
        roots_sh[li] = ((pw << wb) // q).astype(dt)
        inv_roots[li] = ipw.astype(dt)
        inv_roots_sh[li] = ((ipw << wb) // q).astype(dt)
        iv = primes.mod_inverse(n, q)
        ninv[li, 0] = iv
        ninv_sh[li, 0] = shoup(iv, q, wb)
    fs = None
    if fourstep and dt == np.dtype(np.uint32) and n >= 2048:
        from .tntt import make_fourstep
        fs = make_fourstep(moduli, psis, n)
    return NttTables(
        n=n, logn=logn,
        q=jnp.asarray(q_arr), ratio0=jnp.asarray(r0), ratio1=jnp.asarray(r1),
        roots=jnp.asarray(roots), roots_shoup=jnp.asarray(roots_sh),
        inv_roots=jnp.asarray(inv_roots), inv_roots_shoup=jnp.asarray(inv_roots_sh),
        n_inv=jnp.asarray(ninv), n_inv_shoup=jnp.asarray(ninv_sh),
        fs=fs,
        moduli=tuple(moduli), psi=tuple(psis),
    )


def _pallas_mode(t: NttTables):
    """None (XLA stage loop), "tpu" (Pallas), or "interpret" (Pallas on CPU,
    for golden tests). Decided at trace time."""
    import os
    if t.fs is None or os.environ.get("FHE_PALLAS", "1") == "0":
        return None
    if jax.default_backend() == "tpu":
        return "tpu"
    if os.environ.get("FHE_PALLAS_INTERPRET") == "1":
        return "interpret"
    return None


def _ntt(x: jnp.ndarray, t: NttTables) -> jnp.ndarray:
    """Forward negacyclic NTT along the last axis, batched over [..., L, N]."""
    mode = _pallas_mode(t)
    if mode:
        from .tntt import fourstep_ntt
        return fourstep_ntt(x, t.fs, interpret=mode == "interpret")
    return _ntt_stages(x, t)


def _ntt_stages(x: jnp.ndarray, t: NttTables) -> jnp.ndarray:
    """XLA stage-loop forward NTT (also the host-boundary path: runs under
    ensure_compile_time_eval, where a Pallas call cannot execute)."""
    n, logn = t.n, t.logn
    q = t.q  # [L,1] broadcasts against [..., L, m, ...] after reshape below
    for s in range(logn):
        m = 1 << s
        half = n >> (s + 1)
        # Reshape [..., L, N] -> [..., L, m, 2, half]
        xv = x.reshape(*x.shape[:-1], m, 2, half)
        w = t.roots[:, m:2 * m]                                      # [L, m]
        ws = t.roots_shoup[:, m:2 * m]
        w = w[..., :, :, None]    # [L, m, 1]
        ws = ws[..., :, :, None]
        qq = q[..., :, None]      # [L, 1, 1] vs [..., L, m, half]
        u = xv[..., 0, :]
        v = mul_mod_shoup(xv[..., 1, :], w, ws, qq)
        x = jnp.stack([add_mod(u, v, qq), sub_mod(u, v, qq)], axis=-2).reshape(x.shape)
    return x


def _intt(x: jnp.ndarray, t: NttTables) -> jnp.ndarray:
    """Inverse negacyclic NTT; returns natural-order coefficients."""
    mode = _pallas_mode(t)
    if mode:
        from .tntt import fourstep_intt
        return fourstep_intt(x, t.fs, interpret=mode == "interpret")
    return _intt_stages(x, t)


def _intt_stages(x: jnp.ndarray, t: NttTables) -> jnp.ndarray:
    n, logn = t.n, t.logn
    q = t.q
    for s in range(logn - 1, -1, -1):
        m = 1 << s
        half = n >> (s + 1)
        xv = x.reshape(*x.shape[:-1], m, 2, half)
        w = t.inv_roots[:, m:2 * m]
        ws = t.inv_roots_shoup[:, m:2 * m]
        w = w[..., :, :, None]
        ws = ws[..., :, :, None]
        qq = q[..., :, None]
        u = xv[..., 0, :]
        v = xv[..., 1, :]
        x = jnp.stack(
            [add_mod(u, v, qq), mul_mod_shoup(sub_mod(u, v, qq), w, ws, qq)],
            axis=-2,
        ).reshape(x.shape)
    return mul_mod_shoup(x, t.n_inv, t.n_inv_shoup, q)


# Jitted entry points: one fused XLA program per (shape, table-shape) instead
# of ~15 ops × log2(N) stages dispatched eagerly. Inside an outer jit these
# inline transparently.
ntt = jax.jit(_ntt)
intt = jax.jit(_intt)


def host_ntt(coeffs: list[int], q: int, psi: int) -> list[int]:
    """Python-int oracle: same butterfly network as ``ntt`` for one limb."""
    n = len(coeffs)
    logn = n.bit_length() - 1
    x = list(coeffs)
    for s in range(logn):
        m = 1 << s
        half = n >> (s + 1)
        for i in range(m):
            w = pow(psi, bit_reverse(m + i, logn), q)
            base = i * 2 * half
            for j in range(base, base + half):
                u = x[j]
                v = x[j + half] * w % q
                x[j] = (u + v) % q
                x[j + half] = (u - v) % q
    return x


def host_intt(vals: list[int], q: int, psi: int) -> list[int]:
    """Python-int oracle inverse of ``host_ntt``."""
    n = len(vals)
    logn = n.bit_length() - 1
    inv_psi = primes.mod_inverse(psi, q)
    x = list(vals)
    for s in range(logn - 1, -1, -1):
        m = 1 << s
        half = n >> (s + 1)
        for i in range(m):
            w = pow(inv_psi, bit_reverse(m + i, logn), q)
            base = i * 2 * half
            for j in range(base, base + half):
                u = x[j]
                v = x[j + half]
                x[j] = (u + v) % q
                x[j + half] = (u - v) * w % q
    n_inv = primes.mod_inverse(n, q)
    return [c * n_inv % q for c in x]


def point_exponents(n: int) -> np.ndarray:
    """Exponent e[j] (odd, mod 2N) such that forward-NTT output slot j holds
    the evaluation of the input polynomial at ψ**e[j].

    Derived once, modulus-independently, from the butterfly network: slot j
    after the full forward pass evaluates at ψ^{2·br(j)+1}.
    """
    logn = n.bit_length() - 1
    return np.array([(2 * bit_reverse(j, logn) + 1) % (2 * n) for j in range(n)],
                    dtype=np.int64)


def galois_ntt_permutation(n: int, galois_elt: int) -> np.ndarray:
    """Index map ``perm`` with (x∘X^g in NTT form)[j] = x_ntt[perm[j]].

    Applying the Galois automorphism X -> X^g to a polynomial maps the
    evaluation at point p to the evaluation of the *new* polynomial at any p'
    with p'^g = p ... concretely new_eval[j] = old_eval at point ψ^{g·e[j]}.
    """
    e = point_exponents(n)
    index_of = {int(ex): j for j, ex in enumerate(e)}
    g = galois_elt % (2 * n)
    return np.array([index_of[(g * int(e[j])) % (2 * n)] for j in range(n)],
                    dtype=np.int32)


def galois_coeff_maps(n: int, galois_elt: int) -> tuple[np.ndarray, np.ndarray]:
    """(dst_index, sign) for coefficient-domain Galois: out[i*g mod 2n] gets
    ±x[i] (sign -1 when i*g mod 2n >= n, i.e. X^{n+k} = -X^k).

    Returned as a source-gather map: out[j] = sign[j] * x[src[j]].
    """
    g = galois_elt % (2 * n)
    src = np.zeros(n, dtype=np.int32)
    sign = np.zeros(n, dtype=np.int8)
    for i in range(n):
        d = i * g % (2 * n)
        if d < n:
            src[d] = i
            sign[d] = 1
        else:
            src[d - n] = i
            sign[d - n] = -1
    return src, sign
