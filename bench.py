"""Benchmark: ct-mult+relin throughput per chip at production-scale params.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the CPU reference publishes no ops/s figure (BASELINE.md); from its
run log, a conv layer of ~12.3 s executes ≈ 9 weighted ct-ops ≈ 0.7–1.5
ct-mult+relin-equivalents/s on a 50-thread Xeon at the same logN=16 regime.
We use 8 ops/s as a generous single-node CPU estimate; vs_baseline is
ours / 8.

Usage: python bench.py [--logn 15] [--levels 20] [--iters 20]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=14)
    ap.add_argument("--levels", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--metric", default="ct_mult_relin")
    args = ap.parse_args()

    import jax
    from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
    from fhe_gpt2_tpu.core.evaluator import (
        Ciphertext, Decryptor, Encryptor, Evaluator,
    )
    from fhe_gpt2_tpu.core.keys import KeyGenerator

    t0 = time.time()
    params = CkksParams.create(
        logn=args.logn, log_q0=51, log_scale=46, num_levels=args.levels,
        log_special=51, hamming_weight=192)
    ctx = CkksContext(params)
    kg = KeyGenerator(ctx, seed=1)
    ev = Evaluator(ctx, relin_key=kg.relin_key())
    enc = Encryptor(ctx, secret=kg.secret, seed=2)
    dec = Decryptor(ctx, kg.secret)
    print(f"# setup {time.time()-t0:.1f}s  logN={args.logn} L={args.levels}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, ctx.params.slots)
    ct = enc.encrypt(ev.make_plain(z, params.scale, args.levels))

    def step(data):
        c = Ciphertext(data, params.scale)
        out = ev.multiply(c, c)          # mult + relinearize
        return out.data

    # Chain the iterations inside one jitted program: the multiply keeps
    # level/shape, so the dependent chain measures pure device throughput
    # without per-call tunnel dispatch latency.
    def chain(data):
        for _ in range(args.iters):
            data = step(data)
        return data

    chain_j = jax.jit(chain)
    t0 = time.time()
    out = jax.block_until_ready(chain_j(ct.data))
    compile_s = time.time() - t0
    print(f"# first call (compile) {compile_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    jax.block_until_ready(chain_j(ct.data))
    dt = time.time() - t0
    ops_per_s = args.iters / dt

    baseline_cpu = 8.0
    print(json.dumps({
        "metric": f"ct_mult_relin_ops_per_s_chip_logN{args.logn}_L{args.levels}",
        "value": round(ops_per_s, 3),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_s / baseline_cpu, 2),
    }))


if __name__ == "__main__":
    main()
