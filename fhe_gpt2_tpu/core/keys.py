"""Key generation: sparse-ternary secret, public key, relinearization and
Galois key-switching keys.

Counterpart of the reference's KeyGenerator (keygenerator.cpp) with its
sparse-secret modification (keygenerator.cpp:64-76 / rlwe.cpp:40-70
``sample_poly_sparse_ternary``). Key-switching keys use the SEAL-3.6 hybrid
scheme: one digit per ciphertext limb, a single special prime P, digit i of
the key holding (-a_i·s + e_i) with P·s_src added into limb i
(generate_one_kswitch_key semantics).

Sampling runs host-side in numpy (keygen and encryption are boundary ops, not
hot loops); all keys are stored NTT-form on device.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from . import ntt as nttmod
from .context import CkksContext
from .modmath import add_mod, sub_mod, neg_mod, mul_mod, mul_mod_shoup, \
    shoup, word_dtype, word_bits_of


@jax.jit
def _rlwe_batch_core(a, e, s_ntt, t):
    """b = -(a·s) + NTT(e) for batched a/e: a [..., L, N] uniform NTT-domain
    samples, e [..., L, N] coefficient-domain noise."""
    e_ntt = nttmod._ntt(e, t)
    b = add_mod(
        neg_mod(mul_mod(a, s_ntt, t.q, t.ratio0, t.ratio1), t.q),
        e_ntt, t.q)
    return b


@jax.jit
def _ksk_assemble_core(b, a, s_src_ntt, p_factor, p_shoup, own_mask, t):
    """Add P·s_src into digit j's b component on its own limb group:
    b,a [D, L+k, N]; p_factor/p_shoup [L+k, 1] (P mod q_j); own_mask
    [D, L+k, 1] bool marking the data limbs digit j covers.

    Since P ≡ 0 mod every special prime, the encrypted value is exactly
    P·V_j·s_src with V_j ≡ 1 mod Q_j, ≡ 0 mod Q/Q_j — the hybrid-scheme
    digit factor; alpha=1 reduces to SEAL's generate_one_kswitch_key."""
    term = mul_mod_shoup(s_src_ntt, p_factor, p_shoup, t.q)   # [L+k, N]
    b = jnp.where(own_mask, add_mod(b, term[None], t.q), b)
    return jnp.stack([b, a], axis=1)                          # [D, 2, L+k, N]


# ---------------------------------------------------------------------------
# Host-side samplers (numpy RNG). Residues are per-limb uint64 arrays.
# ---------------------------------------------------------------------------

def _to_rns(signed: np.ndarray, moduli: list[int]) -> np.ndarray:
    """Small signed int64 coefficients -> word-dtype [L, N] residues."""
    dt = word_dtype(moduli)
    out = np.zeros((len(moduli), signed.shape[-1]), dtype=dt)
    for i, q in enumerate(moduli):
        out[i] = np.mod(signed, np.int64(q)).astype(dt)
    return out


def sample_ternary(rng: np.random.Generator, n: int, hamming_weight: int = 0):
    """Ternary secret coefficients; sparse with given hamming weight if set.

    Mirrors sample_poly_sparse_ternary (util/rlwe.cpp:40-70): exactly h
    nonzero ±1 entries at uniform positions.
    """
    if hamming_weight:
        c = np.zeros(n, dtype=np.int64)
        pos = rng.choice(n, size=hamming_weight, replace=False)
        c[pos] = rng.integers(0, 2, size=hamming_weight) * 2 - 1
        return c
    return rng.integers(-1, 2, size=n).astype(np.int64)


def sample_gaussian(rng: np.random.Generator, n: int, std: float = 3.2):
    return np.round(rng.normal(0.0, std, size=n)).astype(np.int64)


def sample_uniform_rns(rng: np.random.Generator, n: int, moduli: list[int]):
    dt = word_dtype(moduli)
    out = np.zeros((len(moduli), n), dtype=dt)
    for i, q in enumerate(moduli):
        out[i] = rng.integers(0, q, size=n, dtype=np.uint64).astype(dt)
    return out


# ---------------------------------------------------------------------------
# Key containers
# ---------------------------------------------------------------------------

@dataclass
class SecretKey:
    ntt: jnp.ndarray       # uint64 [L+k, N], NTT form over the full basis
    coeffs: np.ndarray     # int64 [N] ternary (host, for debug/serialization)


@dataclass
class PublicKey:
    data: jnp.ndarray      # uint64 [2, L+k, N] NTT form (b, a) at key level


@dataclass
class KSwitchKey:
    """data[digit] = uint64 [2, L+k, N] NTT form; digit j covers the limb
    group [j*alpha, (j+1)*alpha) where alpha = number of special primes."""
    data: jnp.ndarray      # uint64 [num_digits, 2, L+k, N]


@dataclass
class GaloisKeys:
    keys: dict = field(default_factory=dict)   # galois_elt -> KSwitchKey

    def __contains__(self, elt):
        return elt in self.keys

    def __getitem__(self, elt) -> KSwitchKey:
        return self.keys[elt]

    def step_set(self, ctx) -> frozenset:
        """Rotation steps covered by the held keys (for multi-hop planning)."""
        cached = getattr(self, "_steps", None)
        if cached is not None and cached[0] == len(self.keys):
            return cached[1]
        steps = frozenset(
            s for s in (ctx.step_from_elt(e) for e in self.keys)
            if s is not None)
        self._steps = (len(self.keys), steps)
        return steps


def digit_steps(slots: int, base: int = 16) -> list[int]:
    """Base-`base` digit rotation set {j·base^k, 0<j<base}: any step in
    [0, slots) decomposes into ≤ log_base(slots) hops. ~45 keys at
    slots=2^14/base=16 vs one key per distinct amount — the Galois-key
    memory strategy for rotation-heavy models (memory_save_rotate role)."""
    out = set()
    b = 1
    while b < slots:
        for j in range(1, base):
            s = j * b
            if s < slots:
                out.add(s)
        b *= base
    return sorted(out)


# Keys are pytrees so jitted programs can take them as *arguments* rather
# than capturing hundreds of MB of key material as inline HLO constants
# (see nn.backend.jit_sealed).
jax.tree_util.register_pytree_node(
    KSwitchKey,
    lambda k: ((k.data,), None),
    lambda _, c: KSwitchKey(data=c[0]),
)
jax.tree_util.register_pytree_node(
    GaloisKeys,
    lambda g: (tuple(g.keys[e] for e in sorted(g.keys)),
               tuple(sorted(g.keys))),
    lambda elts, ch: GaloisKeys(keys=dict(zip(elts, ch))),
)


class KeyGenerator:
    def __init__(self, ctx: CkksContext, seed: int = 0, secure: bool = False,
                 rng=None):
        """secure=True samples from the SHAKE-256 CSPRNG (core/csprng.py,
        fresh os.urandom seed) instead of seeded numpy PCG — the reference's
        Blake2/SHAKE RNG posture (randomgen.cpp) for actual deployments;
        seeded numpy stays the default for reproducible tests/benches."""
        self.ctx = ctx
        if rng is not None:
            self.rng = rng
        elif secure:
            from .csprng import ShakeRng
            self.rng = ShakeRng()
        else:
            self.rng = np.random.default_rng(seed)
        s = sample_ternary(self.rng, ctx.n, ctx.params.hamming_weight)
        s_rns = _to_rns(s, ctx.all_moduli)
        tables = ctx.tables(tuple(range(len(ctx.all_moduli))))
        self.secret = SecretKey(
            ntt=nttmod.ntt(jnp.asarray(s_rns), tables), coeffs=s
        )
        self._tables_all = tables

    # -- helpers ------------------------------------------------------------

    def _rlwe_pair(self, s_ntt: jnp.ndarray) -> jnp.ndarray:
        """Fresh (b, a) with b = -(a·s) + e over the full basis (NTT form)."""
        ctx = self.ctx
        t = self._tables_all
        a = jnp.asarray(sample_uniform_rns(self.rng, ctx.n, ctx.all_moduli))
        e = jnp.asarray(
            _to_rns(sample_gaussian(self.rng, ctx.n, ctx.params.error_std),
                    ctx.all_moduli)
        )
        e_ntt = nttmod.ntt(e, t)
        b = add_mod(
            neg_mod(mul_mod(a, s_ntt, t.q, t.ratio0, t.ratio1), t.q),
            e_ntt, t.q,
        )
        return jnp.stack([b, a])

    def public_key(self) -> PublicKey:
        return PublicKey(data=self._rlwe_pair(self.secret.ntt))

    def _kswitch_key(self, s_src_ntt: jnp.ndarray) -> KSwitchKey:
        """Key-switching key from s_src to the secret s: one digit per group
        of alpha = len(special) ciphertext limbs (hybrid scheme; alpha=1 is
        SEAL-3.6's digit-per-limb layout, evaluator.cpp:2281).

        All digits are generated in one batched jitted call (the reference's
        generate_one_kswitch_key loop, fused)."""
        ctx = self.ctx
        t = self._tables_all
        L = ctx.L
        D = ctx.num_digits(L)
        P = 1
        for p in ctx.special:
            P *= p
        n_mod = len(ctx.all_moduli)
        a = np.stack([sample_uniform_rns(self.rng, ctx.n, ctx.all_moduli)
                      for _ in range(D)])
        e = np.stack([
            _to_rns(sample_gaussian(self.rng, ctx.n, ctx.params.error_std),
                    ctx.all_moduli) for _ in range(D)])
        b = _rlwe_batch_core(jnp.asarray(a), jnp.asarray(e), self.secret.ntt, t)
        p_factor = np.array([P % q for q in ctx.all_moduli],
                            dtype=ctx.word).reshape(-1, 1)
        p_sh = np.array(
            [shoup(P % q, q, ctx.word_bits) for q in ctx.all_moduli],
            dtype=ctx.word).reshape(-1, 1)
        own = np.zeros((D, n_mod, 1), dtype=bool)
        for j, g in enumerate(ctx.digit_groups(L)):
            own[j, list(g)] = True
        data = _ksk_assemble_core(b, jnp.asarray(a), s_src_ntt,
                                  jnp.asarray(p_factor), jnp.asarray(p_sh),
                                  jnp.asarray(own), t)
        return KSwitchKey(data=data)

    def relin_key(self) -> KSwitchKey:
        t = self._tables_all
        s2 = mul_mod(self.secret.ntt, self.secret.ntt, t.q, t.ratio0, t.ratio1)
        return self._kswitch_key(s2)

    def galois_key(self, galois_elt: int) -> KSwitchKey:
        perm = self.ctx.galois_perm(galois_elt)
        s_g = jnp.take(self.secret.ntt, perm, axis=-1)
        return self._kswitch_key(s_g)

    def galois_keys(self, steps: list[int], conjugate: bool = False) -> GaloisKeys:
        """Keys for a set of rotation steps (and optionally conjugation).

        The reference builds ad-hoc step lists per model (util.h:60-69,
        infer_seal.cpp:345-360); here any declarative step set works.
        """
        out = GaloisKeys()
        elts = {self.ctx.galois_elt_from_step(s) for s in steps if s % (self.ctx.n // 2) != 0}
        if conjugate:
            elts.add(self.ctx.galois_elt_conjugate)
        for elt in sorted(elts):
            out.keys[elt] = self.galois_key(elt)
        return out
