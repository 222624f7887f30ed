"""Full encrypted GPT-2: weight import, plan building, end-to-end forward.

Counterpart of the reference's model layer: plain_approx/full_gpt2.py
(gpt2_setup / gpt2_inference), gpt2_ckks run/infer_gpt2.cpp, and the
weights.proto export pipeline. Weights come from a HuggingFace GPT-2 state
dict (or any dict with the same keys); embedding and LM head run host-side
(the reference's EmbeddingLayer is also plaintext — the private-embedding
variant goes through the PIR path, net/).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from . import layers as L


@dataclass
class GPT2ModelPlans:
    sh: L.GPT2Shapes
    blocks: list                  # [BlockPlans]
    ln_f: L.LnPlans
    wte: Optional[np.ndarray] = None     # [vocab, d] host embedding
    wpe: Optional[np.ndarray] = None     # [pos, d]


def _get(weights, *names):
    for n in names:
        if n in weights:
            w = weights[n]
            return w.detach().cpu().numpy() if hasattr(w, "detach") else np.asarray(w)
    raise KeyError(names)


def build_gpt2_plans(sh: L.GPT2Shapes, weights: dict, n_layers: int,
                     newton_inits=None, giant=None,
                     attn_overrides: dict = None,
                     ln_iters: int = 12) -> GPT2ModelPlans:
    """Build all per-layer LT plans from a HF-style GPT-2 state dict.

    `newton_inits`: per-layer (ln1, ln2) Σz² magnitudes (host-calibrated on
    representative data, like the reference's hardcoded 40298902 /
    5.74e8 inits, full_gpt2.py:101,130); defaults to 1e4·d² heuristics.
    """
    d = sh.hidden
    blocks = []
    for i in range(n_layers):
        p = f"transformer.h.{i}." if any(
            k.startswith("transformer.h.") for k in weights) else f"h.{i}."
        cw = _get(weights, p + "attn.c_attn.weight")
        cb = _get(weights, p + "attn.c_attn.bias")
        wq, wk, wv = np.split(cw, 3, axis=-1)
        bq, bk, bv = np.split(cb, 3, axis=-1)
        wo = _get(weights, p + "attn.c_proj.weight")
        bo = _get(weights, p + "attn.c_proj.bias")
        ap = L.build_attn_plans(sh, wq, bq, wk, bk, wv, bv, wo, bo, giant)
        for k, v in (attn_overrides or {}).items():
            # A list value is per-layer (e.g. trained per-layer/per-head
            # ConsMax β/γ from calibrate.train_consmax).
            setattr(ap, k, v[i] if isinstance(v, list) else v)
        init1, init2 = (newton_inits[i] if newton_inits else
                        (1e4 * d * d, 1e4 * d * d))
        ln1 = L.build_ln_plans(
            sh, _get(weights, p + "ln_1.weight"), _get(weights, p + "ln_1.bias"),
            newton_init=init1, iters=ln_iters)
        ln2 = L.build_ln_plans(
            sh, _get(weights, p + "ln_2.weight"), _get(weights, p + "ln_2.bias"),
            newton_init=init2, iters=ln_iters)
        mp = L.build_mlp_plans(
            sh,
            _get(weights, p + "mlp.c_fc.weight"), _get(weights, p + "mlp.c_fc.bias"),
            _get(weights, p + "mlp.c_proj.weight"), _get(weights, p + "mlp.c_proj.bias"),
            giant)
        blocks.append(L.BlockPlans(ln1=ln1, attn=ap, ln2=ln2, mlp=mp))
    pf = "transformer." if any(k.startswith("transformer.") for k in weights) else ""
    ln_f = L.build_ln_plans(
        sh, _get(weights, pf + "ln_f.weight"), _get(weights, pf + "ln_f.bias"),
        newton_init=(newton_inits[-1][0] if newton_inits else 1e4 * d * d),
        iters=ln_iters)
    wte = wpe = None
    try:
        wte = _get(weights, pf + "wte.weight")
        wpe = _get(weights, pf + "wpe.weight")
    except KeyError:
        pass
    return GPT2ModelPlans(sh=sh, blocks=blocks, ln_f=ln_f, wte=wte, wpe=wpe)


def embed(plans: GPT2ModelPlans, token_ids: np.ndarray) -> np.ndarray:
    """Host-side embedding lookup: [seq] -> [seq, d]."""
    sh = plans.sh
    assert len(token_ids) <= sh.seq
    out = np.zeros((sh.seq, sh.hidden))
    n = len(token_ids)
    out[:n] = plans.wte[token_ids] + plans.wpe[:n]
    return out


def forward(B, xs, plans: GPT2ModelPlans, jit: bool = False,
            boot_need: int = 0):
    """Run all blocks + final LN on backend values (act-layout ct list).

    jit=True (required on TPU): each block is four jitted segments
    (LN1, attention+residual, LN2, MLP+residual) via jit_sealed, with
    structurally identical layers SHARING compiled programs (rebind_sealed
    repopulates mask caches host-side — the same driver architecture as
    cnn/resnet._forward_jit). boot_need > 0 inserts
    B.maybe_bootstrap(·, boot_need) before each segment, keeping bootstraps
    OUTSIDE the traced segments (staged-jit pipeline), the counterpart of
    the reference's bootstrap_full_real_3 placement between GPT-2 kernels
    (run/infer_gpt2.cpp:122-181)."""
    if jit:
        return _forward_jit(B, xs, plans, boot_need)
    for bp in plans.blocks:
        xs = L.block(B, xs, plans.sh, bp)
    return L.layer_norm(B, xs, plans.sh, plans.ln_f)


def _forward_jit(B, xs, plans: GPT2ModelPlans, boot_need: int = 0):
    from .backend import jit_sealed, rebind_sealed

    sh = plans.sh
    jcache: dict = {}
    struct_cache: dict = {}

    def run(name, fn, vs, layer_id=None):
        sig = (tuple(v.level for v in vs), tuple(v.scale for v in vs),
               tuple(v.data.shape for v in vs))
        key = (name, layer_id, sig)
        jf = jcache.get(key)
        if jf is None:
            base = struct_cache.get((name, sig))
            if base is None:
                jf = jit_sealed(B, fn, vs, seq_keys=True)
                struct_cache[(name, sig)] = jf
            else:
                jf = rebind_sealed(base, fn, vs)
            jcache[key] = jf
        return jf(vs)

    def boot(vs):
        if not boot_need:
            return vs
        return [B.maybe_bootstrap(v, boot_need) for v in vs]

    for li, bp in enumerate(plans.blocks):
        n = len(xs)

        def ln1_fn(vs, bp=bp):
            return L.layer_norm(B, vs, sh, bp.ln1)

        def attn_fn(both, bp=bp, n=n):
            h, res = both[:n], both[n:]
            a = L.attention(B, h, sh, bp.attn)
            return [B.add(x, y) for x, y in zip(res, a)]

        def ln2_fn(vs, bp=bp):
            return L.layer_norm(B, vs, sh, bp.ln2)

        def mlp_fn(both, bp=bp, n=n):
            h, res = both[:n], both[n:]
            m = L.mlp(B, h, sh, bp.mlp)
            return [B.add(x, y) for x, y in zip(res, m)]

        h = run("ln1", ln1_fn, boot(xs), layer_id=li)
        xs = run("attn", attn_fn, boot(h) + xs, layer_id=li)
        h = run("ln2", ln2_fn, boot(xs), layer_id=li)
        xs = run("mlp", mlp_fn, boot(h) + xs, layer_id=li)

    def lnf_fn(vs):
        return L.layer_norm(B, vs, sh, plans.ln_f)

    return run("ln_f", lnf_fn, boot(xs))


def logits(plans: GPT2ModelPlans, hidden: np.ndarray) -> np.ndarray:
    """Host-side LM head (weight-tied): hidden [seq, d] -> [seq, vocab]."""
    return hidden @ plans.wte.T


def calibrate_newton_inits(sh: L.GPT2Shapes, weights: dict, n_layers: int,
                           sample: np.ndarray) -> list:
    """Measure per-layer Σz² magnitudes on plaintext sample activations —
    the host-side analogue of the reference's hand-tuned Newton constants."""
    import torch
    outs = []
    x = sample

    def ss(M):
        z = sh.hidden * (M - M.mean(-1, keepdims=True))
        return float((z ** 2).sum(-1).mean())

    def ln(M, g, b):
        mu = M.mean(-1, keepdims=True)
        v = ((M - mu) ** 2).mean(-1, keepdims=True)
        return (M - mu) / np.sqrt(v + 1e-5) * g + b

    def gelu(v):
        import math
        erf = np.vectorize(math.erf)
        return v / 2 * (1 + erf(v / np.sqrt(2)))

    for i in range(n_layers):
        p = f"transformer.h.{i}." if any(
            k.startswith("transformer.h.") for k in weights) else f"h.{i}."
        g1, b1 = _get(weights, p + "ln_1.weight"), _get(weights, p + "ln_1.bias")
        g2, b2 = _get(weights, p + "ln_2.weight"), _get(weights, p + "ln_2.bias")
        s1 = ss(x)
        h = ln(x, g1, b1)
        cw = _get(weights, p + "attn.c_attn.weight")
        cb = _get(weights, p + "attn.c_attn.bias")
        wq, wk, wv = np.split(cw, 3, -1)
        bq, bk, bv = np.split(cb, 3, -1)
        Q, K_, V = h @ wq + bq, h @ wk + bk, h @ wv + bv
        S = x.shape[0]
        att = np.zeros_like(h)
        dh = sh.dh
        for hd in range(sh.heads):
            sl = slice(hd * dh, (hd + 1) * dh)
            sc = Q[:, sl] @ K_[:, sl].T / np.sqrt(dh)
            sc = np.where(np.tril(np.ones((S, S))) > 0, sc, -1e9)
            e = np.exp(sc - sc.max(-1, keepdims=True))
            att[:, sl] = (e / e.sum(-1, keepdims=True)) @ V[:, sl]
        x = x + att @ _get(weights, p + "attn.c_proj.weight") + _get(
            weights, p + "attn.c_proj.bias")
        s2 = ss(x)
        h2 = ln(x, g2, b2)
        m = gelu(h2 @ _get(weights, p + "mlp.c_fc.weight") +
                 _get(weights, p + "mlp.c_fc.bias"))
        x = x + m @ _get(weights, p + "mlp.c_proj.weight") + _get(
            weights, p + "mlp.c_proj.bias")
        outs.append((s1, s2))
    outs.append((ss(x), ss(x)))
    return outs
