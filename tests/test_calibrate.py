"""Calibrated attention knobs: plain forward with derived (not hand-set)
constants must track the torch oracle — closes the reference's
ApproxSoftmax-training gap (gpt2_approx_checkpoint_2.py:37-83) with a
train-free statistical fit."""

import numpy as np

from fhe_gpt2_tpu.nn import layers as L
from fhe_gpt2_tpu.nn import model as M
from fhe_gpt2_tpu.nn.backend import PlainBackend
from fhe_gpt2_tpu.nn.calibrate import calibrate_attn_knobs, fit_consmax_gamma


def test_fit_consmax_gamma_recovers_shift():
    rng = np.random.default_rng(0)
    s = rng.normal(3.0, 1.0, (64, 16))
    g = fit_consmax_gamma(s)
    # ConsMax with γ near the score mean+spread tracks softmax closely.
    e = np.exp(s - g)
    cs = e / e.sum(-1, keepdims=True)
    sm = np.exp(s - s.max(-1, keepdims=True))
    sm /= sm.sum(-1, keepdims=True)
    assert np.abs(cs - sm).max() < 0.15


def test_trained_consmax_matches_torch():
    """Trained per-head ConsMax (the reference's learnable ApproxSoftmax,
    gpt2_approx_checkpoint_2.py:37-83) driving the constant-denominator
    attention path: forward must track the true-softmax torch oracle."""
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    from fhe_gpt2_tpu.nn.calibrate import train_consmax

    torch.manual_seed(0)
    seq, hidden, heads, layers = 16, 32, 4, 2
    cfg = GPT2Config(vocab_size=211, n_positions=seq, n_embd=hidden,
                     n_layer=layers, n_head=heads)
    net = GPT2LMHeadModel(cfg).double().eval()
    weights = dict(net.state_dict())
    sh = L.GPT2Shapes(slots=1024, seq=seq, hidden=hidden, heads=heads)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, seq)
    plans = M.build_gpt2_plans(sh, weights, layers)
    emb = M.embed(plans, ids)
    betas, gammas = train_consmax(sh, weights, layers, emb, iters=200)
    assert len(betas) == layers and betas[0].shape == (heads,)
    assert all((g > 0).all() for g in gammas)
    inits = M.calibrate_newton_inits(sh, weights, layers, emb)
    plans = M.build_gpt2_plans(
        sh, weights, layers, newton_inits=inits,
        attn_overrides=dict(softmax_mode="consmax", consmax_beta=betas,
                            consmax_gamma=gammas, exp_r=8))
    with torch.no_grad():
        want = net.transformer(
            torch.tensor(ids[None])).last_hidden_state[0].numpy()
    B = PlainBackend(sh.slots)
    out = M.forward(B, list(sh.act.pack(emb)), plans)
    got = sh.act.unpack(np.stack(out))
    err = np.abs(got - want).max()
    agree = float((M.logits(plans, got).argmax(-1)
                   == M.logits(plans, want).argmax(-1)).mean())
    # ConsMax trades row-exact normalization for depth (constant per-head
    # denominator): hidden-state drift is larger than the Goldschmidt path's,
    # the functional gate is top-1 agreement (the reference accepts the same
    # trade and recovers it by finetuning the whole model around ConsMax).
    assert err < 1.2, err
    assert agree >= 0.85, agree


def test_calibrated_forward_matches_torch():
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    seq, hidden, heads, layers = 16, 32, 4, 2
    cfg = GPT2Config(vocab_size=211, n_positions=seq, n_embd=hidden,
                     n_layer=layers, n_head=heads)
    net = GPT2LMHeadModel(cfg).double().eval()
    weights = dict(net.state_dict())
    sh = L.GPT2Shapes(slots=1024, seq=seq, hidden=hidden, heads=heads)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, seq)
    plans = M.build_gpt2_plans(sh, weights, layers)
    emb = M.embed(plans, ids)
    inits = M.calibrate_newton_inits(sh, weights, layers, emb)
    knobs = calibrate_attn_knobs(sh, weights, layers, emb)
    assert 2 <= knobs.exp_r <= 12 and knobs.inv_iters <= 24
    assert knobs.inv_prescale > 0
    plans = M.build_gpt2_plans(sh, weights, layers, newton_inits=inits,
                               attn_overrides=knobs.as_overrides())
    with torch.no_grad():
        want = net.transformer(
            torch.tensor(ids[None])).last_hidden_state[0].numpy()
    B = PlainBackend(sh.slots)
    out = M.forward(B, list(sh.act.pack(emb)), plans)
    got = sh.act.unpack(np.stack(out))
    err = np.abs(got - want).max()
    agree = float((M.logits(plans, got).argmax(-1)
                   == M.logits(plans, want).argmax(-1)).mean())
    assert err < 0.5, err
    assert agree >= 0.9, agree
