"""Encrypted GPT-2 inference driver.

Counterpart of the reference's run/infer_gpt2.cpp (`./bench`): builds the
model plans from a GPT-2 checkpoint (HuggingFace if cached locally, else a
randomly initialized model of the requested size), embeds tokens, runs
transformer blocks, reports hidden-state fidelity vs the torch oracle.

    python -m fhe_gpt2_tpu.run_gpt2 --layers 2 --plain
    python -m fhe_gpt2_tpu.run_gpt2 --layers 1 --logn 12  (encrypted, small)
"""

from __future__ import annotations

import argparse
import json
import os
import time

import getpass
import tempfile

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), f"jax_cache_tpu_{getpass.getuser()}"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--seq", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--plain", action="store_true")
    ap.add_argument("--logn", type=int, default=12)
    ap.add_argument("--slots", type=int, default=1024)
    ap.add_argument("--levels", type=int, default=40)
    ap.add_argument("--nsp", type=int, default=1,
                    help="special primes (hybrid key-switch digit size)")
    ap.add_argument("--composite", action="store_true",
                    help="uint32 engine with composite two-prime scaling "
                         "(Δ = q·q′ ≈ 2^50): u64-grade precision at 32-bit "
                         "arithmetic cost; --levels counts pairs")
    ap.add_argument("--real-boot", action="store_true",
                    help="use the real CKKS bootstrap between blocks")
    ap.add_argument("--jit", action="store_true",
                    help="jitted segment driver (required on TPU): four "
                         "programs per block shape (LN1/attn/LN2/MLP), "
                         "same-shape layers share compiled programs")
    ap.add_argument("--boot-need", type=int, default=0,
                    help="logical levels of headroom demanded before each "
                         "jitted segment (maybe_bootstrap); 0 = no "
                         "between-segment refreshes")
    ap.add_argument("--ln-iters", type=int, default=12,
                    help="LayerNorm Newton rsqrt iterations (calibrated "
                         "inits converge in ~4; 12 is the uncalibrated-"
                         "safe default)")
    ap.add_argument("--digit-keys", action="store_true",
                    help="base-16 digit rotation key set instead of exact "
                         "per-step keys (HBM control at large rings)")
    ap.add_argument("--decode", type=int, default=0, metavar="N",
                    help="after the forward, run N autoregressive KV-cache "
                         "decode steps (optimize.cpp augment_value path) and "
                         "report per-step seconds + row parity vs the "
                         "forward pass")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests)")
    a = ap.parse_args()
    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import torch
    from transformers import GPT2Config, GPT2LMHeadModel
    from .nn import layers as L
    from .nn import model as M
    from .nn.backend import PlainBackend

    torch.manual_seed(0)
    cfg = GPT2Config(vocab_size=997, n_positions=max(a.seq, 16),
                     n_embd=a.hidden, n_layer=a.layers, n_head=a.heads)
    net = GPT2LMHeadModel(cfg).double().eval()
    weights = dict(net.state_dict())
    slots = a.slots if a.plain else (1 << (a.logn - 1))
    sh = L.GPT2Shapes(slots=slots, seq=a.seq, hidden=a.hidden, heads=a.heads)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, a.seq)
    plans = M.build_gpt2_plans(sh, weights, a.layers)
    emb = M.embed(plans, ids)
    inits = M.calibrate_newton_inits(sh, weights, a.layers, emb)
    from .nn.calibrate import calibrate_attn_knobs
    knobs = calibrate_attn_knobs(sh, weights, a.layers, emb[: a.seq])
    print(f"# calibrated knobs: {knobs}")
    plans = M.build_gpt2_plans(
        sh, weights, a.layers, newton_inits=inits,
        attn_overrides=knobs.as_overrides(), ln_iters=a.ln_iters)

    with torch.no_grad():
        want = net.transformer(
            torch.tensor(ids[None])).last_hidden_state[0].numpy()

    t0 = time.time()
    if a.plain:
        B = PlainBackend(slots)
        out = M.forward(B, list(sh.act.pack(emb)), plans)
        got = sh.act.unpack(np.stack(out))
    else:
        B, got = _run_encrypted(a, sh, plans, emb)
    dt = time.time() - t0
    err = float(np.abs(got - want).max())
    agree = float((M.logits(plans, got).argmax(-1)
                   == M.logits(plans, want).argmax(-1)).mean())
    print(json.dumps({"layers": a.layers, "mode": "plain" if a.plain else "enc",
                      "seconds": round(dt, 2), "max_err_vs_torch": err,
                      "top1_agreement": agree}))
    if a.decode:
        from .nn import kvcache as KV
        caches = KV.KVCaches.empty(B, sh, len(plans.blocks))
        for t in range(min(a.decode, a.seq)):
            t0 = time.time()
            row = KV.decode_step(B, plans, caches, emb[t], t)
            print(json.dumps({
                "decode_step": t, "seconds": round(time.time() - t0, 2),
                "row_err_vs_forward": float(np.abs(row - got[t]).max())}))


def _run_encrypted(a, sh, plans, emb):
    from .core.context import CkksContext, CkksParams
    from .core.evaluator import Decryptor, Encryptor, Evaluator
    from .core.keys import KeyGenerator
    from .nn import model as M
    from .nn.backend import CkksBackend, RecordingBackend

    rec = RecordingBackend(sh.slots)
    M.forward(rec, list(sh.act.pack(emb)), plans)
    if a.composite:
        params = CkksParams.create_composite(
            logn=a.logn, num_levels=a.levels, log_scale=50, log_q0=55,
            log_special=31, num_special=max(a.nsp, 3), hamming_weight=64)
    else:
        params = CkksParams.create(
            logn=a.logn, log_q0=50, log_scale=40, num_levels=a.levels,
            log_special=51, num_special=a.nsp, hamming_weight=64)
    ctx = CkksContext(params)
    levels = len(params.moduli) if a.composite else a.levels
    assert ctx.params.slots == sh.slots
    kg = KeyGenerator(ctx, seed=1)
    ev = Evaluator(ctx, relin_key=kg.relin_key())
    enc = Encryptor(ctx, secret=kg.secret, seed=2)
    dec = Decryptor(ctx, kg.secret)
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=dec, default_level=levels)
    steps = set(rec.key_steps())
    if a.real_boot:
        from .boot.bootstrap import Bootstrapper, make_evalmod
        eps = params.scale / ctx.q0_float
        # Production window on the composite engine (K=25/deg59, the
        # h=192 reference window); the small K=12/deg45 window otherwise.
        if a.composite:
            em = make_evalmod(K=25, eps=max(eps * 1.05, 2 ** -5), degree=59,
                              arcsin_degree=3, prec_dps=80)
        else:
            em = make_evalmod(K=12, eps=max(eps * 1.05, 2 ** -5), degree=45,
                              arcsin_degree=3, prec_dps=60)
        B.boot = Bootstrapper(B, evalmod=em)
        steps.update(B.boot.required_steps())
    if a.decode:
        from .nn import kvcache as KV
        rec = RecordingBackend(sh.slots)
        rc = KV.KVCaches.empty(rec, sh, len(plans.blocks))
        for t in range(min(a.decode, a.seq)):
            KV.decode_step(rec, plans, rc, emb[t], t)
        steps.update(rec.key_steps())
    if a.digit_keys:
        from .core.keys import digit_steps
        steps = set(digit_steps(ctx.params.slots, base=16))
    ev.galois_keys = kg.galois_keys(steps=sorted(steps), conjugate=True)
    xs = [B.from_slots(v) for v in sh.act.pack(emb)]
    out = M.forward(B, xs, plans, jit=a.jit, boot_need=a.boot_need)
    return B, sh.act.unpack(np.stack([B.to_slots(o) for o in out]))


if __name__ == "__main__":
    main()
