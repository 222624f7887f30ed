"""End-to-end GPT-2 (plain simulator) vs torch/HF oracle — the counterpart of
the reference's test_end_to_end.py (plain_approx vs float64 torch GPT-2)."""

import numpy as np
import pytest

from fhe_gpt2_tpu.nn import layers as L
from fhe_gpt2_tpu.nn import model as M
from fhe_gpt2_tpu.nn.backend import PlainBackend


@pytest.fixture(scope="module")
def tiny_gpt2():
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel
    torch.manual_seed(0)
    cfg = GPT2Config(
        vocab_size=97, n_positions=16, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    model = GPT2LMHeadModel(cfg).double().eval()
    return model, cfg


def test_gpt2_plain_vs_torch(tiny_gpt2):
    import torch
    model, cfg = tiny_gpt2
    sh = L.GPT2Shapes(slots=1024, seq=16, hidden=32, heads=4)
    weights = dict(model.state_dict())

    ids = np.arange(16) % cfg.vocab_size
    with torch.no_grad():
        want_h = model.transformer(torch.tensor(ids[None])).last_hidden_state[0].numpy()

    plans = M.build_gpt2_plans(sh, weights, n_layers=cfg.n_layer)
    emb = M.embed(plans, ids)
    inits = M.calibrate_newton_inits(sh, weights, cfg.n_layer, emb)
    plans = M.build_gpt2_plans(
        sh, weights, n_layers=cfg.n_layer, newton_inits=inits,
        attn_overrides=dict(exp_r=8, inv_iters=16, inv_prescale=2.0,
                            smax_gamma=6.0))

    B = PlainBackend(sh.slots)
    xs = list(sh.act.pack(emb))
    out = M.forward(B, xs, plans)
    got_h = sh.act.unpack(np.stack(out))

    # Approximate softmax/exp/inverse dominate the error budget.
    assert np.abs(got_h - want_h).max() < 0.15
    # Logit ranking sanity: top-1 next-token prediction matches.
    got_l = M.logits(plans, got_h)
    want_l = M.logits(plans, want_h)
    agree = (got_l.argmax(-1) == want_l.argmax(-1)).mean()
    assert agree >= 0.8
