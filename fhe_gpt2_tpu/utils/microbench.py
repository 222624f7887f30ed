"""Microbenchmark registry with exact correctness checks.

Counterpart of the reference's run/microbenchmark.cpp:229-333 registry
(ATTN_PROJ_ROW..BOOTSTRAP, test_util.cpp:62-115): each entry builds a real
context, runs the kernel jitted, times steady-state iterations, and verifies
the decrypted result against a plaintext oracle.

Usage: python -m fhe_gpt2_tpu.utils.microbench <name> [--logn 12] [...]
       python -m fhe_gpt2_tpu.utils.microbench list
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _setup(logn, levels, hamming=32, steps=(), conj=False, seed=0):
    import jax
    from ..core.context import CkksContext, CkksParams
    from ..core.evaluator import Decryptor, Encryptor, Evaluator
    from ..core.keys import KeyGenerator
    from ..nn.backend import CkksBackend
    params = CkksParams.create(logn=logn, log_q0=50, log_scale=40,
                               num_levels=levels, log_special=51,
                               hamming_weight=hamming)
    ctx = CkksContext(params)
    kg = KeyGenerator(ctx, seed=seed)
    ev = Evaluator(ctx, relin_key=kg.relin_key(),
                   galois_keys=kg.galois_keys(steps=list(steps), conjugate=conj))
    enc = Encryptor(ctx, secret=kg.secret, seed=seed + 1)
    dec = Decryptor(ctx, kg.secret)
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=dec, default_level=levels)
    return params, ctx, ev, enc, dec, B


def _time(fn, args, iters):
    import jax
    out = jax.block_until_ready(fn(*args))      # compile
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def bench_mult_relin(a):
    import jax
    from ..core.evaluator import Ciphertext
    params, ctx, ev, enc, dec, B = _setup(a.logn, a.levels)
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, ctx.params.slots)
    ct = enc.encrypt(ev.make_plain(z, params.scale, a.levels))

    @jax.jit
    def step(d):
        return ev.multiply(Ciphertext(d, params.scale), Ciphertext(d, params.scale)).data

    dt, out = _time(step, (ct.data,), a.iters)
    got = dec.decrypt(ev.rescale(Ciphertext(out, params.scale ** 2)))
    ok = bool(np.allclose(got, z * z, atol=1e-3))
    return dt, ok


def bench_rotate(a):
    import jax
    from ..core.evaluator import Ciphertext
    params, ctx, ev, enc, dec, B = _setup(a.logn, a.levels, steps=[1])
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, ctx.params.slots)
    ct = enc.encrypt(ev.make_plain(z, params.scale, a.levels))

    @jax.jit
    def step(d):
        return ev.rotate(Ciphertext(d, params.scale), 1).data

    dt, out = _time(step, (ct.data,), a.iters)
    got = dec.decrypt(Ciphertext(out, params.scale))
    ok = bool(np.allclose(got, np.roll(z, -1), atol=1e-3))
    return dt, ok


def bench_ntt(a):
    import jax
    from ..core import ntt as nttmod
    params, ctx, *_ = _setup(a.logn, a.levels)
    t = ctx.tables(a.levels)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, ctx.n, dtype=np.uint64)
                  for q in ctx.moduli[:a.levels]])
    import jax.numpy as jnp
    xd = jnp.asarray(x)
    dt, out = _time(nttmod.ntt, (xd, t), a.iters)
    back = np.asarray(nttmod.intt(out, t))
    return dt, bool((back == x).all())


def bench_matmul_lt(a):
    from ..nn.backend import PlainBackend, RecordingBackend
    from ..nn.formats import TightLayout, matmul_spec
    from ..nn.linear import apply_lt
    import jax
    rng = np.random.default_rng(0)
    rows, d = 16, 32
    slots = 1 << (a.logn - 1)
    lay = TightLayout(rows, d, slots)
    A = rng.standard_normal((rows, d)) * 0.3
    W = rng.standard_normal((d, d)) * 0.3
    plan = matmul_spec(W, lay).bsgs_plan()
    rec = RecordingBackend(slots)
    apply_lt(rec, plan, list(lay.pack(A)))
    params, ctx, ev, enc, dec, B = _setup(a.logn, a.levels,
                                          steps=rec.key_steps())
    xs = [B.from_slots(v) for v in lay.pack(A)]

    def step():
        return apply_lt(B, plan, xs)

    t0 = time.time()
    out = step()
    import jax
    jax.block_until_ready([o.data for o in out])
    dt = time.time() - t0
    got = lay.unpack(np.stack([B.to_slots(o) for o in out]))
    return dt, bool(np.allclose(got, A @ W, atol=1e-3))


def bench_layernorm(a):
    from ..nn import layers as L
    from ..nn.backend import PlainBackend, RecordingBackend
    import jax
    rng = np.random.default_rng(0)
    slots = 1 << (a.logn - 1)
    sh = L.GPT2Shapes(slots=slots, seq=8, hidden=16, heads=4)
    A = rng.standard_normal((sh.seq, sh.hidden))
    z = sh.hidden * (A - A.mean(-1, keepdims=True))
    ln = L.build_ln_plans(sh, np.ones(sh.hidden), np.zeros(sh.hidden),
                          newton_init=(z ** 2).sum(-1).mean(), iters=3,
                          eps=1e-4)
    xs_p = list(sh.act.pack(A))
    rec = RecordingBackend(slots)
    L.layer_norm(rec, xs_p, sh, ln)
    params, ctx, ev, enc, dec, B = _setup(a.logn, max(a.levels, 18),
                                          steps=rec.key_steps())
    xs = [B.from_slots(v) for v in xs_p]
    t0 = time.time()
    out = L.layer_norm(B, xs, sh, ln)
    jax.block_until_ready([o.data for o in out])
    dt = time.time() - t0
    got = sh.act.unpack(np.stack([B.to_slots(o) for o in out]))
    want = sh.act.unpack(np.stack(L.layer_norm(
        PlainBackend(slots), xs_p, sh, ln)))
    return dt, bool(np.abs(got - want).max() < 1e-2)


def bench_bootstrap(a):
    from ..boot.bootstrap import Bootstrapper, make_evalmod
    import jax
    params, ctx, ev, enc, dec, B = _setup(a.logn, max(a.levels, 22),
                                          hamming=16)
    # Patch sparse slots for the bootstrap.
    ns = min(64, ctx.params.slots)
    em = make_evalmod(K=12, eps=2 ** -5, degree=45, arcsin_degree=3,
                      prec_dps=60)
    boot = Bootstrapper(B, num_slots=ns, evalmod=em)
    from ..core.keys import KeyGenerator
    kg = KeyGenerator(ctx, seed=0)  # same seed as _setup -> same secret
    ev.galois_keys = kg.galois_keys(steps=boot.required_steps(),
                                    conjugate=True)
    rng = np.random.default_rng(1)
    z = rng.uniform(-1, 1, ns)
    ct = enc.encrypt(ev.make_plain(z, params.scale, 1))
    t0 = time.time()
    out = boot.bootstrap(ct)
    jax.block_until_ready(out.data)
    dt = time.time() - t0
    back = np.real(dec.decrypt(out, num_slots=ns))
    return dt, bool(np.abs(back - z).mean() < 2e-2)


REGISTRY = {
    "mult_relin": bench_mult_relin,
    "rotate": bench_rotate,
    "ntt": bench_ntt,
    "matmul_lt": bench_matmul_lt,
    "layernorm": bench_layernorm,
    "bootstrap": bench_bootstrap,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--logn", type=int, default=12)
    ap.add_argument("--levels", type=int, default=12)
    ap.add_argument("--iters", type=int, default=5)
    a = ap.parse_args()
    if a.name == "list":
        print("\n".join(REGISTRY))
        return
    dt, ok = REGISTRY[a.name](a)
    print(json.dumps({"bench": a.name, "logn": a.logn, "levels": a.levels,
                      "seconds": round(dt, 5), "correct": ok}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
