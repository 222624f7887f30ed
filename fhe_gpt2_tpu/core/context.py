"""CKKS parameter sets and the device-resident context.

Replaces the reference's ``EncryptionParameters``/``SEALContext``
(encryptionparams.h, context.cpp) including its modifications: sparse secret
hamming weight (encryptionparams.h:187) and sparse slots
(encryptionparams.h:216). Unlike the reference's per-level context-data linked
list, the context here is a flat bundle of device arrays; ops slice the limb
axis statically per level, which jit specializes on.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from . import primes, ntt as nttmod, rns
from .modmath import barrett_ratio, shoup, word_dtype, word_bits_of


@dataclass(frozen=True)
class CkksParams:
    """Static CKKS parameters (host-side, hashable)."""

    n: int                      # polynomial degree (2^logn)
    moduli: tuple               # ciphertext modulus chain q_0..q_{L-1}
    special: tuple              # special (key-switching) primes
    scale: float                # default encoding scale
    hamming_weight: int = 0     # sparse ternary secret weight (0 = dense)
    sparse_slots: int = 0       # bootstrap sparse slot count (0 = n/2)
    error_std: float = 3.2
    # Composite scaling (uint32 engine at u64-grade precision): each logical
    # level is `rescale_limbs` primes whose product ≈ scale, and the
    # bootstrap base modulus is the product of the first `base_limbs` primes.
    # 1/1 = classic single-prime scaling.
    rescale_limbs: int = 1
    base_limbs: int = 1

    @property
    def levels(self) -> int:
        return len(self.moduli)

    @property
    def slots(self) -> int:
        return self.n // 2

    @property
    def word_bits(self) -> int:
        return word_bits_of(word_dtype(list(self.moduli) + list(self.special)))

    @staticmethod
    def create(logn: int, log_q0: int, log_scale: int, num_levels: int,
               log_special: int = 0, num_special: int = 1,
               hamming_weight: int = 0, sparse_slots: int = 0,
               balanced: bool = True) -> "CkksParams":
        """SEAL-style chain: [q0 (log_q0 bits), num_levels scale primes
        (log_scale bits), special primes (log_special bits, defaults to
        log_q0)].

        With ``balanced`` (default), scale primes alternate above/below
        2**log_scale so the cumulative prime/scale drift stays minimal —
        negligible at 46-bit scales, essential for the uint32 engine where
        NTT-friendly primes near 2**25 are ~2**-8 apart relative.
        All moduli < 2**31 selects the uint32 engine automatically."""
        n = 1 << logn
        two_n = 2 * n
        log_special = log_special or log_q0
        q0 = primes.gen_primes(log_q0, 1, two_n)
        if balanced:
            scale_primes = primes.gen_primes_balanced(
                log_scale, num_levels, two_n, exclude=set(q0))
        else:
            scale_primes = primes.gen_primes(log_scale, num_levels, two_n)
        used = set(q0) | set(scale_primes)
        sp = []
        below = None
        while len(sp) < num_special:
            cands = primes.gen_primes(log_special, num_special + len(used),
                                      two_n, below=below)
            sp = [p for p in cands if p not in used][:num_special]
            below = cands[-1]
        return CkksParams(
            n=n,
            moduli=tuple(q0 + scale_primes),
            special=tuple(sp),
            scale=float(2 ** log_scale),
            hamming_weight=hamming_weight,
            sparse_slots=sparse_slots,
        )

    @staticmethod
    def create_composite(logn: int, num_levels: int, log_scale: int = 50,
                         log_q0: int = 55, log_special: int = 31,
                         num_special: int = 3, hamming_weight: int = 0,
                         sparse_slots: int = 0) -> "CkksParams":
        """Composite two-prime scaling chain on <2**31 moduli (uint32
        engine): Δ = q·q′ ≈ 2**log_scale per level, base modulus
        Q0 = q0·q0′ ≈ 2**log_q0. Each rescale drops a pair; encode/rescale
        rounding noise is 2**-log_scale-grain — u64-engine precision from
        TPU-native 32-bit arithmetic. (The measured single-prime w32
        bootstrap noise floor — Δ=2**25 grain amplified ~10³ through
        EvalMod — is structural; this is the fix.)"""
        n = 1 << logn
        two_n = 2 * n
        q0 = primes.gen_prime_pairs(log_q0, 1, two_n)
        used = set(q0)
        chain = primes.gen_prime_pairs(log_scale, num_levels, two_n,
                                       exclude=used)
        used |= set(chain)
        sp = []
        below = None
        while len(sp) < num_special:
            cands = primes.gen_primes(log_special, num_special + len(used),
                                      two_n, below=below)
            sp = [p for p in cands if p not in used][:num_special]
            below = cands[-1]
        assert max(q0 + chain + sp) < (1 << 31), "composite chain must be u32"
        return CkksParams(
            n=n,
            moduli=tuple(q0 + chain),
            special=tuple(sp),
            scale=float(2 ** log_scale),
            hamming_weight=hamming_weight,
            sparse_slots=sparse_slots,
            rescale_limbs=2,
            base_limbs=2,
        )


class CkksContext:
    """Precomputed device constants for one parameter set.

    Holds NTT tables over the full basis (q chain + special primes), per-level
    rescale/mod-down tables, and the Galois permutation cache. Everything is
    immutable after construction; jitted ops close over the slices they need.
    """

    def __init__(self, params: CkksParams):
        self.params = params
        self.n = params.n
        self.logn = params.n.bit_length() - 1
        self.moduli = list(params.moduli)
        self.special = list(params.special)
        self.all_moduli = self.moduli + self.special
        self.L = len(self.moduli)
        self.k_sp = len(self.special)
        self.word = word_dtype(self.all_moduli)       # np.uint32 / np.uint64
        self.word_bits = word_bits_of(self.word)
        # NTT tables over every modulus in the system; level slices are views.
        # uint32 chains at TPU-size rings also get Pallas four-step tables.
        self.ntt_all = nttmod.make_ntt_tables(
            self.all_moduli, self.n,
            fourstep=(self.word_bits == 32 and self.n >= 2048))
        self._level_tables: dict[tuple, nttmod.NttTables] = {}
        self._galois_perm: dict[int, jnp.ndarray] = {}
        self._drop_last: dict[int, rns.DropLastTables] = {}
        self._mod_down: dict[tuple, rns.DropLastTables] = {}
        self._decomp: dict[int, tuple] = {}
        self._p_res: dict[int, tuple] = {}
        # Slot index maps (see embedding.py): slot j <-> exponent 5^j mod 2n.
        # Generator 5 (not 3): 5 ≡ 1 (mod 4) makes ζ^(n) = i uniformly over
        # the orbit, which the bootstrap CtS/StC FFT factorization requires.
        e = nttmod.point_exponents(self.n)
        index_of = np.zeros(2 * self.n, dtype=np.int64)
        index_of[e] = np.arange(self.n)
        self.exp_of_slot = np.zeros(self.n // 2, dtype=np.int64)
        g = 1
        for j in range(self.n // 2):
            self.exp_of_slot[j] = g
            g = g * 5 % (2 * self.n)
        self.slot_to_index = index_of[self.exp_of_slot]
        self.conj_slot_to_index = index_of[(2 * self.n - self.exp_of_slot) % (2 * self.n)]

    # -- composite-scaling geometry -----------------------------------------

    @property
    def rescale_limbs(self) -> int:
        """Limbs one rescale drops (pairs under composite scaling)."""
        return self.params.rescale_limbs

    @property
    def base_limbs(self) -> int:
        """Limbs forming the bootstrap base modulus Q0."""
        return self.params.base_limbs

    @property
    def q0_int(self) -> int:
        """Base modulus Q0 = prod(moduli[:base_limbs]) as an exact int."""
        return math.prod(self.moduli[: self.base_limbs])

    @property
    def q0_float(self) -> float:
        return float(self.q0_int)

    def rescale_divisor(self, level: int) -> float:
        """What the next rescale at `level` divides the scale by: the
        product of the rescale_limbs trailing primes."""
        return float(math.prod(
            self.moduli[level - self.rescale_limbs: level]))

    # -- table accessors ----------------------------------------------------

    def tables(self, limbs: tuple[int, ...] | int) -> nttmod.NttTables:
        """NTT tables for a static limb index set. ``int`` means limbs 0..l-1."""
        if isinstance(limbs, int):
            limbs = tuple(range(limbs))
        key = tuple(limbs)
        if key not in self._level_tables:
            # Cached constants must be concrete even when first requested
            # inside a trace (jit/eval_shape) — never cache tracers.
            with jax.ensure_compile_time_eval():
                self._level_tables[key] = self.ntt_all.slice(list(key))
        return self._level_tables[key]

    def key_limbs(self, level: int) -> tuple[int, ...]:
        """Limb index set for key-switching at `level`: q_0..q_{level-1} + specials."""
        return tuple(range(level)) + tuple(
            self.L + i for i in range(self.k_sp)
        )

    # -- hybrid key-switch digit structure -----------------------------------
    #
    # The digit size alpha equals the number of special primes (the standard
    # hybrid/dnum trade-off: P = prod(special) must dominate any digit product
    # Q_j). alpha=1 reproduces SEAL-3.6's digit-per-limb scheme
    # (evaluator.cpp:2281); alpha>1 cuts both key material and key-switch
    # NTT count by ~alpha.

    @property
    def alpha(self) -> int:
        return self.k_sp

    def num_digits(self, level: int) -> int:
        return -(-level // self.alpha)

    def digit_groups(self, level: int) -> tuple[tuple[int, ...], ...]:
        """Active data-limb index groups per key-switch digit at `level`."""
        a = self.alpha
        return tuple(
            tuple(range(j * a, min((j + 1) * a, level)))
            for j in range(self.num_digits(level))
        )

    def decomp_tables(self, level: int):
        """Per-digit base-conversion tables: digit group -> full key basis."""
        if level not in self._decomp:
            dst = [self.all_moduli[i] for i in self.key_limbs(level)]
            with jax.ensure_compile_time_eval():
                self._decomp[level] = tuple(
                    rns.make_base_conv([self.moduli[i] for i in g], dst)
                    for g in self.digit_groups(level)
                )
        return self._decomp[level]

    def drop_last_tables(self, level: int) -> rns.DropLastTables:
        """Rescale tables: divide by q_{level-1}, keep q_0..q_{level-2}."""
        if level not in self._drop_last:
            with jax.ensure_compile_time_eval():
                self._drop_last[level] = rns.make_drop_last(
                    self.moduli[: level - 1], self.moduli[level - 1]
                )
        return self._drop_last[level]

    def fused_md_tables(self, level: int, pair: bool = False):
        """Constants for the fused mod-down kernel (core/tks.py): divide by
        the special primes (pair=False) or by the trailing rescale pair
        (pair=True, composite rescale)."""
        key = ("fmd", level, pair)
        if key not in self._mod_down:
            from . import tks
            mdt = (self.rescale_pair_tables(level) if pair
                   else self.mod_down_onestep_tables(level))
            out_l = level - self.rescale_limbs if pair else level
            self._mod_down[key] = tks.make_fused_md_tables(
                mdt, self.tables(out_l))
        return self._mod_down[key]

    def fused_ks_tables(self, level: int):
        """Constants for the fused decompose+NTT+MAC key-switch kernel
        (core/tks.py); cached per level."""
        key = ("fks", level)
        if key not in self._mod_down:
            from . import tks
            self._mod_down[key] = tks.make_fused_ks_tables(self, level)
        return self._mod_down[key]

    def rescale_pair_tables(self, level: int) -> rns.ModDownTables:
        """One-shot composite rescale tables: divide by the trailing
        rescale_limbs primes in a single fast base conversion (same
        HPS mod-down as the key-switch path) — g limb iNTTs + one NTT of
        the correction instead of g sequential exact drops (2·g small
        transforms)."""
        g = self.rescale_limbs
        key = ("pair", level)
        if key not in self._mod_down:
            with jax.ensure_compile_time_eval():
                self._mod_down[key] = rns.make_mod_down(
                    self.moduli[: level - g], self.moduli[level - g: level])
        return self._mod_down[key]

    def mod_down_onestep_tables(self, level: int) -> rns.ModDownTables:
        """One-shot key-switch mod-down tables: divide by P = prod(special)
        in a single fast base conversion (see rns.ModDownTables)."""
        key = ("onestep", level)
        if key not in self._mod_down:
            with jax.ensure_compile_time_eval():
                self._mod_down[key] = rns.make_mod_down(
                    self.moduli[:level], self.special)
        return self._mod_down[key]

    def mod_down_tables(self, level: int, sp: int = 0) -> rns.DropLastTables:
        """Key-switch mod-down tables: divide by special prime `sp`, keeping
        q_0..q_{level-1} + specials 0..sp-1 (specials drop last-to-first)."""
        key = (level, sp)
        if key not in self._mod_down:
            with jax.ensure_compile_time_eval():
                self._mod_down[key] = rns.make_drop_last(
                    self.moduli[:level] + self.special[:sp], self.special[sp]
                )
        return self._mod_down[key]

    def galois_perm(self, galois_elt: int) -> jnp.ndarray:
        """NTT-domain permutation for X -> X^g, cached on device."""
        if galois_elt not in self._galois_perm:
            with jax.ensure_compile_time_eval():
                self._galois_perm[galois_elt] = jnp.asarray(
                    nttmod.galois_ntt_permutation(self.n, galois_elt)
                )
        return self._galois_perm[galois_elt]

    def galois_elt_from_step(self, step: int) -> int:
        """Rotation by `step` slots (left) = automorphism X -> X^{5^step}."""
        two_n = 2 * self.n
        step = step % (self.n // 2)
        return pow(5, step, two_n)

    def step_from_elt(self, elt: int):
        """Inverse of galois_elt_from_step (None for conjugation/unknown)."""
        tab = getattr(self, "_elt_to_step", None)
        if tab is None:
            two_n = 2 * self.n
            tab = {}
            g = 1
            for s in range(self.n // 2):
                tab[g] = s
                g = (g * 5) % two_n
            self._elt_to_step = tab
        return tab.get(elt)

    @property
    def galois_elt_conjugate(self) -> int:
        return 2 * self.n - 1

    def p_residues(self, level: int):
        """(P mod q_i, shoup) over the key basis at `level`, shape [l+k, 1].

        P = prod(special primes); residues at the special limbs are 0. Used to
        lift a base-Q polynomial into the extended QP basis (multiply by P)
        for double-hoisted rotations.
        """
        if level not in self._p_res:
            P = math.prod(self.special)
            limbs = self.key_limbs(level)
            r = np.array([P % self.all_moduli[i] for i in limbs],
                         dtype=self.word).reshape(-1, 1)
            sh = np.array(
                [shoup(int(v), self.all_moduli[i], self.word_bits) if v else 0
                 for v, i in zip(r.ravel(), limbs)],
                dtype=self.word).reshape(-1, 1)
            with jax.ensure_compile_time_eval():
                self._p_res[level] = (jnp.asarray(r), jnp.asarray(sh))
        return self._p_res[level]

    # -- scalar helpers -----------------------------------------------------

    def const_residues(self, value: int, limbs: tuple[int, ...]) -> np.ndarray:
        """[value mod q_i] for a static limb set, as a word-dtype column."""
        return np.array(
            [value % self.all_moduli[i] for i in limbs], dtype=self.word
        ).reshape(-1, 1)


@lru_cache(maxsize=None)
def test_params(logn: int = 10, levels: int = 4) -> CkksParams:
    """Small parameter set for fast CPU tests."""
    return CkksParams.create(
        logn=logn, log_q0=50, log_scale=40, num_levels=levels,
        log_special=51, hamming_weight=16,
    )


@lru_cache(maxsize=None)
def test_params_w32(logn: int = 10, levels: int = 6) -> CkksParams:
    """Small uint32-engine parameter set for fast CPU tests (moduli < 2**31
    select the 32-bit word automatically). num_special=2 with ~2**31 special
    primes keeps P >> digit products: measured rotation noise ~3e-5 at scale
    2**25 vs 5e-4 at a single 2**30 special prime."""
    return CkksParams.create(
        logn=logn, log_q0=29, log_scale=25, num_levels=levels,
        log_special=31, num_special=2, hamming_weight=16,
    )


@lru_cache(maxsize=None)
def w32_params(logn: int = 15, levels: int = 22, num_special: int = 3,
               log_scale: int = 25, hamming_weight: int = 192,
               sparse_slots: int = 0) -> CkksParams:
    """Production uint32-engine chain: q0 ~2**29 (q0/scale headroom 2**4, the
    reference's logq0−logp=5-bit margin class), balanced ~2**25 scale primes,
    ~2**31 special primes. All moduli < 2**31 → TPU-native 32-bit arithmetic
    (native int32 VPU multiplies; half the HBM traffic of the u64 engine)."""
    return CkksParams.create(
        logn=logn, log_q0=29, log_scale=log_scale, num_levels=levels,
        log_special=31, num_special=num_special,
        hamming_weight=hamming_weight, sparse_slots=sparse_slots,
    )


@lru_cache(maxsize=None)
def cnn_params() -> CkksParams:
    """Reference CNN parameter regime (infer_seal.cpp:287-322): logN=16,
    logq0=51, logp=46, L=16 usable + 14 bootstrap levels, special 51, h=192."""
    return CkksParams.create(
        logn=16, log_q0=51, log_scale=46, num_levels=30,
        log_special=51, hamming_weight=192, sparse_slots=1 << 14,
    )


@lru_cache(maxsize=None)
def gpt2_params() -> CkksParams:
    """Reference GPT-2 regime (run/infer_gpt2.cpp:63-85): logN=16, L=21+14,
    logq0=51, logp=46, special 60, h=192."""
    return CkksParams.create(
        logn=16, log_q0=51, log_scale=46, num_levels=35,
        log_special=60, hamming_weight=192, sparse_slots=1 << 14,
    )
