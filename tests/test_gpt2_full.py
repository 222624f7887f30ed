"""Full-scale GPT-2 (12 layers, 768 hidden, 128 seq, 32768 slots) on the
plain simulator vs torch — the reference's test_end_to_end.py at real
dimensions. Weights are randomly initialized (HF hub is unreachable in this
environment); the test validates full-scale packing/kernel numerics.
"""

import numpy as np
import pytest

from fhe_gpt2_tpu.nn import layers as L
from fhe_gpt2_tpu.nn import model as M
from fhe_gpt2_tpu.nn.backend import PlainBackend


@pytest.mark.full
@pytest.mark.slow
def test_gpt2_full_scale_plain():
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel
    torch.manual_seed(0)
    cfg = GPT2Config(vocab_size=50257, n_positions=128, n_embd=768,
                     n_layer=12, n_head=12)
    net = GPT2LMHeadModel(cfg).double().eval()
    weights = dict(net.state_dict())
    sh = L.GPT2Shapes(slots=32768, seq=128, hidden=768, heads=12)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, 128)
    plans = M.build_gpt2_plans(sh, weights, cfg.n_layer)
    emb = M.embed(plans, ids)
    inits = M.calibrate_newton_inits(sh, weights, cfg.n_layer, emb)
    plans = M.build_gpt2_plans(
        sh, weights, cfg.n_layer, newton_inits=inits,
        attn_overrides=dict(exp_r=9, inv_iters=18, inv_prescale=0.04,
                            smax_gamma=2.0))

    import torch as _t
    with _t.no_grad():
        want = net.transformer(_t.tensor(ids[None])).last_hidden_state[0].numpy()

    B = PlainBackend(sh.slots)
    out = M.forward(B, list(sh.act.pack(emb)), plans)
    got = sh.act.unpack(np.stack(out))

    err = np.abs(got - want).max()
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"full-scale GPT-2: max abs err {err:.4f}, rel {rel:.4f}")
    got_l = M.logits(plans, got)
    want_l = M.logits(plans, want)
    agree = (got_l.argmax(-1) == want_l.argmax(-1)).mean()
    print(f"top-1 agreement: {agree:.3f}")
    assert agree >= 0.9
    assert rel < 0.1
