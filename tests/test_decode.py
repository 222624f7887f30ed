"""KV-cache incremental decode vs full forward (plain backend).

The reference's intended decode path (optimize.cpp augment_value_row/col +
the cache update in layers.cpp:44-50) rebuilt on diagonal-form attention:
feeding tokens one at a time through decode_step must reproduce the full
causal forward pass row-for-row, because attention targets come only from
the cached K/V rows.
"""

import numpy as np

from fhe_gpt2_tpu.nn import kvcache as KV
from fhe_gpt2_tpu.nn import layers as L
from fhe_gpt2_tpu.nn.backend import PlainBackend
from fhe_gpt2_tpu.nn.model import GPT2ModelPlans

SH = L.GPT2Shapes(slots=1024, seq=16, hidden=32, heads=4)
B = PlainBackend(SH.slots)


def _tiny_plans(rng, sample, n_layers=2):
    """Random tiny GPT-2 plans with Newton inits calibrated on `sample`
    activations (the reference hand-tunes these constants; model.py's
    calibrate_newton_inits is the production version of this)."""
    d = SH.hidden
    n_act = sample.shape[0]

    def w():
        return rng.standard_normal((d, d)) / np.sqrt(d)

    def ss_of(M):
        z = d * (M - M.mean(-1, keepdims=True))
        return float((z ** 2).sum(-1).mean())

    def oracle_ln(M):
        mu = M.mean(-1, keepdims=True)
        v = ((M - mu) ** 2).mean(-1, keepdims=True)
        return (M - mu) / np.sqrt(v)

    blocks = []
    x = sample
    for _ in range(n_layers):
        wq, wk, wv, wo = w(), w(), w(), w()
        bq, bk, bv, bo = (rng.standard_normal(d) * 0.05 for _ in range(4))
        ap = L.build_attn_plans(SH, wq, bq, wk, bk, wv, bv, wo, bo)
        ap.exp_r = 6
        ap.inv_iters = 16
        ap.inv_prescale = 2.0 / (SH.seq + 1)
        ap.smax_gamma = 2.0
        ln1 = L.build_ln_plans(SH, np.ones(d), np.zeros(d),
                               newton_init=ss_of(x), iters=16, eps=1e-4)
        # Oracle attention (exact softmax; magnitudes only).
        h = oracle_ln(x)
        Q = (h @ wq + bq) / np.sqrt(SH.dh)
        Km, V = h @ wk + bk, h @ wv + bv
        att = np.zeros_like(h)
        for hd in range(SH.heads):
            sl = slice(hd * SH.dh, (hd + 1) * SH.dh)
            sc = Q[:, sl] @ Km[:, sl].T
            sc = np.where(np.tril(np.ones((n_act, n_act))) > 0, sc, -1e9)
            e = np.exp(sc - sc.max(-1, keepdims=True))
            att[:, sl] = (e / e.sum(-1, keepdims=True)) @ V[:, sl]
        x = x + att @ wo + bo
        ln2 = L.build_ln_plans(SH, np.ones(d), np.zeros(d),
                               newton_init=ss_of(x), iters=16, eps=1e-4)
        w1 = rng.standard_normal((d, 4 * d)) / np.sqrt(d)
        b1 = rng.standard_normal(4 * d) * 0.05
        w2 = rng.standard_normal((4 * d, d)) / np.sqrt(4 * d)
        b2 = rng.standard_normal(d) * 0.05
        mp = L.build_mlp_plans(SH, w1, b1, w2, b2)
        h2 = oracle_ln(x)
        x = x + np.maximum(h2 @ w1 + b1, 0) @ w2 + b2   # crude GELU stand-in
        blocks.append(L.BlockPlans(ln1=ln1, attn=ap, ln2=ln2, mlp=mp))
    ln_f = L.build_ln_plans(SH, np.ones(d), np.zeros(d),
                            newton_init=ss_of(x), iters=16, eps=1e-4)
    return GPT2ModelPlans(sh=SH, blocks=blocks, ln_f=ln_f)


def test_decode_matches_full_forward():
    rng = np.random.default_rng(11)
    n_tok = 6
    X = rng.standard_normal((n_tok, SH.hidden)) * 0.5
    plans = _tiny_plans(rng, X)

    # Full causal forward over all rows at once.
    act = np.zeros((SH.seq, SH.hidden))
    act[:n_tok] = X
    xs = list(SH.act.pack(act))
    for bp in plans.blocks:
        xs = L.block(B, xs, SH, bp)
    xs = L.layer_norm(B, xs, SH, plans.ln_f)
    full = SH.act.unpack(np.stack(xs))

    # Incremental decode, one token at a time.
    caches = KV.KVCaches.empty(B, SH, len(plans.blocks))
    rows = []
    for t in range(n_tok):
        rows.append(KV.decode_step(B, plans, caches, X[t], t))
    inc = np.stack(rows)

    err = np.abs(inc - full[:n_tok])
    assert err.max() < 1e-6, err.max()
