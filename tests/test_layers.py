"""GPT-2 layer tests on the plaintext simulator vs numpy oracles.

Mirrors the reference's plain_approx test strategy (test_attn.py,
test_layers.py: kernel sims vs torch) at small parameterized shapes.
"""

import numpy as np
import pytest

from fhe_gpt2_tpu.nn import layers as L
from fhe_gpt2_tpu.nn.backend import PlainBackend

SH = L.GPT2Shapes(slots=1024, seq=16, hidden=32, heads=4)
B = PlainBackend(SH.slots)


def pack_act(A):
    return list(SH.act.pack(A))


def unpack_act(xs):
    return SH.act.unpack(np.stack(xs))


def oracle_ln(A, gamma, beta):
    mu = A.mean(-1, keepdims=True)
    var = ((A - mu) ** 2).mean(-1, keepdims=True)
    return (A - mu) / np.sqrt(var) * gamma + beta


def oracle_gelu(x):
    import math
    erf = np.vectorize(math.erf)
    return x / 2 * (1 + erf(x / np.sqrt(2)))


def oracle_attention(A, wq, bq, wk, bk, wv, bv, wo, bo, sh, gamma_sub,
                     exp_r, inv_iters, prescale):
    """Numpy oracle reproducing the smax (ConsMax) semantics exactly."""
    Q = (A @ wq + bq) / np.sqrt(sh.dh)
    Km = A @ wk + bk
    V = A @ wv + bv
    S = sh.seq
    out = np.zeros_like(A)
    for h in range(sh.heads):
        sl = slice(h * sh.dh, (h + 1) * sh.dh)
        sc = Q[:, sl] @ Km[:, sl].T
        e = np.power(1 + (sc - gamma_sub) / 2 ** exp_r, 2 ** exp_r)
        mask = np.tril(np.ones((S, S)))
        e = e * mask
        den = e.sum(-1, keepdims=True)
        n_, d_ = np.full_like(den, prescale), den * prescale
        for _ in range(inv_iters):
            f = 2 - d_
            n_, d_ = n_ * f, d_ * f
        w_ = e * n_
        out[:, sl] = w_ @ V[:, sl]
    return out @ wo + bo


def rand_w(rng, d1, d2, scale=0.3):
    return rng.standard_normal((d1, d2)) * scale / np.sqrt(d1)


def test_layer_norm():
    RNG = np.random.default_rng(0)
    A = RNG.standard_normal((SH.seq, SH.hidden))
    gamma = RNG.uniform(0.5, 1.5, SH.hidden)
    beta = RNG.uniform(-0.2, 0.2, SH.hidden)
    ss = ((SH.hidden * (A - A.mean(-1, keepdims=True))) ** 2).sum(-1).mean()
    ln = L.build_ln_plans(SH, gamma, beta, newton_init=ss, iters=16, eps=1e-4)
    got = unpack_act(L.layer_norm(B, pack_act(A), SH, ln))
    want = oracle_ln(A, gamma, beta)
    assert np.abs(got - want).max() < 1e-4


def test_attention_diag_form():
    RNG = np.random.default_rng(1)
    A = RNG.standard_normal((SH.seq, SH.hidden)) * 0.5
    d = SH.hidden
    wq, wk, wv, wo = (rand_w(RNG, d, d, 1.0) for _ in range(4))
    bq, bk, bv, bo = (RNG.standard_normal(d) * 0.05 for _ in range(4))
    ap = L.build_attn_plans(SH, wq, bq, wk, bk, wv, bv, wo, bo)
    ap.exp_r = 7
    ap.inv_iters = 14
    ap.inv_prescale = 2.0
    got = unpack_act(L.attention(B, pack_act(A), SH, ap, smax_gamma=4.0))
    want = oracle_attention(A, wq, bq, wk, bk, wv, bv, wo, bo, SH, 4.0,
                            7, 14, ap.inv_prescale)
    assert np.abs(got - want).max() < 1e-6


def test_attention_vs_true_softmax():
    RNG = np.random.default_rng(2)
    """smax path against the true-softmax oracle (approximation-level check)."""
    A = RNG.standard_normal((SH.seq, SH.hidden)) * 0.5
    d = SH.hidden
    wq, wk, wv, wo = (rand_w(RNG, d, d, 1.0) for _ in range(4))
    bq, bk, bv, bo = (RNG.standard_normal(d) * 0.05 for _ in range(4))
    ap = L.build_attn_plans(SH, wq, bq, wk, bk, wv, bv, wo, bo)
    ap.exp_r = 8
    ap.inv_iters = 16
    ap.inv_prescale = 2.0
    got = unpack_act(L.attention(B, pack_act(A), SH, ap, smax_gamma=4.0))
    Q = (A @ wq + bq) / np.sqrt(SH.dh)
    Km = A @ wk + bk
    V = A @ wv + bv
    want = np.zeros_like(A)
    for h in range(SH.heads):
        sl = slice(h * SH.dh, (h + 1) * SH.dh)
        sc = Q[:, sl] @ Km[:, sl].T
        sc = np.where(np.tril(np.ones((SH.seq, SH.seq))) > 0, sc, -1e9)
        e = np.exp(sc - sc.max(-1, keepdims=True))
        want[:, sl] = (e / e.sum(-1, keepdims=True)) @ V[:, sl]
    want = want @ wo + bo
    assert np.abs(got - want).max() < 0.05


def test_attention_chunked_matches_full():
    """delta_chunk changes memory shape only, not values."""
    RNG = np.random.default_rng(6)
    A = RNG.standard_normal((SH.seq, SH.hidden)) * 0.5
    d = SH.hidden
    wq, wk, wv, wo = (rand_w(RNG, d, d, 1.0) for _ in range(4))
    bq, bk, bv, bo = (RNG.standard_normal(d) * 0.05 for _ in range(4))
    ap = L.build_attn_plans(SH, wq, bq, wk, bk, wv, bv, wo, bo)
    full = unpack_act(L.attention(B, pack_act(A), SH, ap, smax_gamma=4.0))
    chunked = unpack_act(L.attention(B, pack_act(A), SH, ap, smax_gamma=4.0,
                                     delta_chunk=5))
    assert np.abs(full - chunked).max() < 1e-12


def test_attention_max_softmax():
    """Real-max path (compute_softmax semantics) vs the true-softmax oracle."""
    from fhe_gpt2_tpu.approx.minimax import auto_schedule
    from fhe_gpt2_tpu.nn import kernels as K

    RNG = np.random.default_rng(7)
    A = RNG.standard_normal((SH.seq, SH.hidden)) * 0.5
    d = SH.hidden
    wq, wk, wv, wo = (rand_w(RNG, d, d, 1.0) for _ in range(4))
    bq, bk, bv, bo = (RNG.standard_normal(d) * 0.05 for _ in range(4))
    ap = L.build_attn_plans(SH, wq, bq, wk, bk, wv, bv, wo, bo)
    ap.sign = K.SignPlans.from_composite(
        auto_schedule(target_err=2.0 ** -12, eps=2.0 ** -9))
    ap.exp_r = 6
    ap.inv_iters = 20
    ap.inv_prescale = 2.0 / (SH.seq + 1)   # denominator spans [1, seq]
    ap.max_bound = 2.0
    got = unpack_act(L.attention(B, pack_act(A), SH, ap, softmax="max"))
    Q = (A @ wq + bq) / np.sqrt(SH.dh)
    Km = A @ wk + bk
    V = A @ wv + bv
    want = np.zeros_like(A)
    for h in range(SH.heads):
        sl = slice(h * SH.dh, (h + 1) * SH.dh)
        sc = Q[:, sl] @ Km[:, sl].T
        sc = np.where(np.tril(np.ones((SH.seq, SH.seq))) > 0, sc, -1e9)
        e = np.exp(sc - sc.max(-1, keepdims=True))
        want[:, sl] = (e / e.sum(-1, keepdims=True)) @ V[:, sl]
    want = want @ wo + bo
    assert np.abs(got - want).max() < 0.05, np.abs(got - want).max()


def test_mlp():
    RNG = np.random.default_rng(3)
    A = RNG.standard_normal((SH.seq, SH.hidden)) * 0.5
    d = SH.hidden
    w1 = rand_w(RNG, d, 4 * d, 1.0)
    b1 = RNG.standard_normal(4 * d) * 0.05
    w2 = rand_w(RNG, 4 * d, d, 1.0)
    b2 = RNG.standard_normal(d) * 0.05
    mp = L.build_mlp_plans(SH, w1, b1, w2, b2)
    got = unpack_act(L.mlp(B, pack_act(A), SH, mp))
    want = oracle_gelu(A @ w1 + b1) @ w2 + b2
    assert np.abs(got - want).max() < 1e-3


def test_block():
    RNG = np.random.default_rng(4)
    A = RNG.standard_normal((SH.seq, SH.hidden)) * 0.3
    d = SH.hidden
    wq, wk, wv, wo = (rand_w(RNG, d, d, 1.0) for _ in range(4))
    bq, bk, bv, bo = (RNG.standard_normal(d) * 0.05 for _ in range(4))
    g1, be1 = np.ones(d), np.zeros(d)
    g2, be2 = RNG.uniform(0.8, 1.2, d), RNG.standard_normal(d) * 0.02
    w1 = rand_w(RNG, d, 4 * d, 1.0)
    b1 = RNG.standard_normal(4 * d) * 0.05
    w2 = rand_w(RNG, 4 * d, d, 1.0)
    b2 = RNG.standard_normal(d) * 0.05

    # Newton inits: measure Σz² magnitude from the oracle intermediates.
    def ss_of(M):
        z = SH.hidden * (M - M.mean(-1, keepdims=True))
        return (z ** 2).sum(-1).mean()

    ln1 = L.build_ln_plans(SH, g1, be1, newton_init=ss_of(A), iters=16, eps=1e-4)
    ap = L.build_attn_plans(SH, wq, bq, wk, bk, wv, bv, wo, bo)
    ap.exp_r = 8
    ap.inv_iters = 16
    ap.inv_prescale = 2.0
    ap.smax_gamma = 4.0

    h1 = oracle_ln(A, g1, be1)
    a1 = oracle_attention(h1, wq, bq, wk, bk, wv, bv, wo, bo, SH, 4.0,
                          8, 16, ap.inv_prescale)
    r1 = A + a1
    ln2 = L.build_ln_plans(SH, g2, be2, newton_init=ss_of(r1), iters=16, eps=1e-4)
    mp = L.build_mlp_plans(SH, w1, b1, w2, b2)
    bp = L.BlockPlans(ln1=ln1, attn=ap, ln2=ln2, mlp=mp)

    got = unpack_act(L.block(B, pack_act(A), SH, bp))
    h2 = oracle_ln(r1, g2, be2)
    want = r1 + oracle_gelu(h2 @ w1 + b1) @ w2 + b2
    assert np.abs(got - want).max() < 5e-3
