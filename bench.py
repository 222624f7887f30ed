"""Benchmark: CKKS throughput on one TPU chip at production-scale params.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metrics:
  ct_mult_relin (default) — ciphertext multiply+relinearize ops/s. The CPU
    reference publishes no ops/s figure (BASELINE.md); from its run log, a
    conv layer of ~12.3 s executes ≈ 9 weighted ct-ops ≈ 0.7–1.5
    ct-mult+relin-equivalents/s on a 50-thread Xeon at the same logN=16
    regime. We use 8 ops/s as a generous single-node CPU estimate;
    vs_baseline is ours / 8.
  bootstrap — one full CKKS bootstrap (ModRaise→SubSum→CtS→EvalMod→StC),
    whole pipeline in a single jitted program, with a decrypt-and-compare
    correctness check. Baseline: the reference's measured 102.5 s per
    bootstrap (result/resnet20_cifar10_image0.txt); vs_baseline is
    102.5 / ours.

Usage: python bench.py [--metric ct_mult_relin|bootstrap]
                       [--logn 14] [--levels 16] [--nsp 3] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

import getpass
import tempfile

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), f"jax_cache_tpu_{getpass.getuser()}"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def _setup(args, hamming=None, sparse_slots=0):
    hamming = hamming if hamming is not None else args.hamming
    from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
    from fhe_gpt2_tpu.core.evaluator import Decryptor, Encryptor, Evaluator
    from fhe_gpt2_tpu.core.keys import KeyGenerator

    t0 = time.time()
    if args.composite:
        # uint32 engine + composite two-prime scaling: Δ = q·q′ ≈ 2^50 on
        # <2^31 moduli — u64-grade precision at 32-bit arithmetic cost.
        # --levels counts logical levels (pairs).
        params = CkksParams.create_composite(
            logn=args.logn, num_levels=args.levels, log_scale=50, log_q0=55,
            log_special=31, num_special=args.nsp, hamming_weight=hamming,
            sparse_slots=sparse_slots)
    elif args.word == 32:
        # uint32 engine: native int32 VPU multiplies + Pallas four-step NTT.
        params = CkksParams.create(
            logn=args.logn, log_q0=29, log_scale=25, num_levels=args.levels,
            log_special=31, num_special=args.nsp, hamming_weight=hamming,
            sparse_slots=sparse_slots)
    else:
        params = CkksParams.create(
            logn=args.logn, log_q0=51, log_scale=46, num_levels=args.levels,
            log_special=51, num_special=args.nsp, hamming_weight=hamming,
            sparse_slots=sparse_slots)
    if args.composite:
        args.levels = len(params.moduli)   # limb count for downstream uses
    ctx = CkksContext(params)
    kg = KeyGenerator(ctx, seed=1)
    ev = Evaluator(ctx, relin_key=kg.relin_key())
    enc = Encryptor(ctx, secret=kg.secret, seed=2)
    dec = Decryptor(ctx, kg.secret)
    print(f"# setup {time.time()-t0:.1f}s  logN={args.logn} L={args.levels} "
          f"alpha={args.nsp} digits={ctx.num_digits(args.levels)}",
          file=sys.stderr)
    return params, ctx, kg, ev, enc, dec


def bench_mult_relin(args):
    import jax
    from fhe_gpt2_tpu.core.evaluator import Ciphertext

    params, ctx, kg, ev, enc, dec = _setup(args, hamming=args.hamming)
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, ctx.params.slots)
    ct = enc.encrypt(ev.make_plain(z, params.scale, args.levels))

    def step(data):
        c = Ciphertext(data, params.scale)
        out = ev.multiply(c, c)          # mult + relinearize
        if args.composite:
            # Composite chains must rescale (drop the pair) each step —
            # scale-relabeled rescale-free chaining lets XLA collapse the
            # dependent chain on this path and reports a fantasy number
            # (observed 58k ops/s vs 23.6 real). The metric is then
            # mult+relin+rescale, the engine's actual unit op.
            out = ev.rescale(out)
        return out.data

    # Chain the iterations inside one jitted program: the multiply keeps
    # level/shape, so the dependent chain measures pure device throughput
    # without per-call tunnel dispatch latency. The relin key rides as a
    # jit ARGUMENT — captured inline it becomes a hundreds-of-MB HLO
    # constant at logN=16/u64 and overflows remote-compile transports.
    def chain(relin, data):
        saved = ev.relin_key
        ev.relin_key = relin
        try:
            for _ in range(args.iters):
                data = step(data)
        finally:
            ev.relin_key = saved
        return data

    relin = ev.relin_key
    if args.composite:
        # One jitted step, looped outside with block_until_ready: the
        # 10-level inline chain carries per-level NTT-table constants that
        # exceed the axon remote-compile transport (HTTP 413). Dispatch
        # latency (~1 ms) is noise against the ~40 ms composite op.
        step_j = jax.jit(chain)          # chain with iters=1 below
        saved_iters, args.iters = args.iters, 1
        t0 = time.time()
        out = jax.block_until_ready(step_j(relin, ct.data))
        print(f"# first call (compile) {time.time()-t0:.1f}s",
              file=sys.stderr)
        args.iters = saved_iters
        t0 = time.time()
        for _ in range(args.iters):
            jax.block_until_ready(step_j(relin, ct.data))
        dt = time.time() - t0
        ops_per_s = args.iters / dt
        return {
            "metric": f"ct_mult_relin_ops_per_s_chip_logN{args.logn}"
                      f"_L{args.levels}_w32c",
            "value": round(ops_per_s, 3),
            "unit": "ops/s",
            "vs_baseline": round(ops_per_s / 8.0, 2),
        }
    chain_j = jax.jit(chain)
    t0 = time.time()
    out = jax.block_until_ready(chain_j(relin, ct.data))
    compile_s = time.time() - t0
    print(f"# first call (compile) {compile_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    jax.block_until_ready(chain_j(relin, ct.data))
    dt = time.time() - t0
    ops_per_s = args.iters / dt

    baseline_cpu = 8.0
    return {
        "metric": f"ct_mult_relin_ops_per_s_chip_logN{args.logn}"
                  f"_L{args.levels}_w{args.word}"
                  + ("c" if args.composite else ""),
        "value": round(ops_per_s, 3),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_s / baseline_cpu, 2),
    }


def bench_bootstrap(args):
    import jax
    from fhe_gpt2_tpu.boot.bootstrap import Bootstrapper, make_evalmod
    from fhe_gpt2_tpu.core.evaluator import Ciphertext
    from fhe_gpt2_tpu.nn.backend import CkksBackend

    ns = args.sparse_slots or min(1 << 14, 1 << (args.logn - 2))
    params, ctx, kg, ev, enc, dec = _setup(args, sparse_slots=ns)
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=dec,
                    default_level=args.levels,
                    no_ext_hoist=bool(args.no_ext_hoist))
    t0 = time.time()
    # Reference-grade EvalMod window (infer_seal.cpp:287-322): K=25 for the
    # h=192 sparse secret, cos degree 59, 2 double-angle iterations; eps is
    # the actual Δ/q0 of the parameter set (the modraise fraction bound).
    eps = params.scale / ctx.q0_float
    em = make_evalmod(K=args.K, eps=max(eps * 1.05, 2 ** -5),
                      degree=args.degree, arcsin_degree=3, prec_dps=80)
    boot = Bootstrapper(B, num_slots=ns, cts_factors=args.factors,
                        stc_factors=args.factors, evalmod=em)
    steps = boot.required_steps()
    print(f"# evalmod+plans {time.time()-t0:.1f}s  ns={ns} "
          f"rot-keys={len(steps)}", file=sys.stderr)
    t0 = time.time()
    ev.galois_keys = kg.galois_keys(steps=steps, conjugate=True)
    print(f"# galois keygen {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(3)
    z = rng.uniform(-1, 1, ns)
    ct = enc.encrypt(ev.make_plain(z, params.scale, ctx.base_limbs))

    # Staged-jit pipeline: each bootstrap stage is its own small program
    # (keys/masks as jit arguments), compiled once and reused — a single
    # whole-pipeline program OOMs XLA at production rings.
    t0 = time.time()
    out_ct = jax.block_until_ready(boot.bootstrap_jitted(ct))
    print(f"# first call (compile) {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(max(1, args.iters)):
        t0 = time.time()
        out_ct = jax.block_until_ready(boot.bootstrap_jitted(ct))
        times.append(time.time() - t0)
    dt = min(times)

    out = out_ct.data
    back = np.real(dec.decrypt(Ciphertext(out, params.scale), num_slots=ns))
    err = float(np.abs(back - z).mean())
    lvl = out.shape[-2]
    print(f"# mean abs err {err:.2e}  out level {lvl}", file=sys.stderr)
    baseline_s = 102.5   # reference bootstrap wall time (BASELINE.md)
    ok = err < 2e-2
    return {
        "metric": f"bootstrap_seconds_logN{args.logn}_L{args.levels}_ns{ns}"
                  + ("" if ok else "_FAILED_ACCURACY"),
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / dt, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=15)
    ap.add_argument("--levels", type=int, default=22)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--nsp", type=int, default=8,
                    help="special primes = hybrid key-switch digit size "
                         "(one-shot mod-down makes large digits cheap: "
                         "alpha=8 cuts decompose NTTs ~2.2x vs alpha=3)")
    ap.add_argument("--sparse-slots", type=int, default=0)
    ap.add_argument("--factors", type=int, default=2,
                    help="CtS/StC FFT factorization depth")
    ap.add_argument("--K", type=int, default=25,
                    help="EvalMod integer window (reference: 25 for h=192)")
    ap.add_argument("--degree", type=int, default=59,
                    help="EvalMod cosine degree (reference: 59)")
    ap.add_argument("--hamming", type=int, default=192,
                    help="sparse secret weight (reference: 192)")
    ap.add_argument("--no-ext-hoist", action="store_true",
                    help="single-hoisted LT path (smaller compiled programs; "
                         "needed at u64/logN=16 where the double-hoisted CtS "
                         "stage overflows the remote XLA compiler)")
    ap.add_argument("--word", type=int, default=32, choices=[32, 64],
                    help="engine word size: 32 = uint32 moduli (TPU-native, "
                         "~25-bit scale), 64 = uint64 moduli (46-bit scale)")
    ap.add_argument("--composite", action="store_true",
                    help="uint32 engine with composite two-prime scaling "
                         "(Δ = q·q′ ≈ 2^50): u64-grade precision, 32-bit "
                         "arithmetic; --levels counts pairs")
    ap.add_argument("--metric", default="ct_mult_relin",
                    choices=["ct_mult_relin", "bootstrap"])
    ap.add_argument("--cpu-fallback", action="store_true",
                    help=argparse.SUPPRESS)   # set by the retry path only
    args = ap.parse_args()
    if args.cpu_fallback:
        # TPU unreachable: measure a reduced ring on CPU, label honestly.
        import jax
        jax.config.update("jax_platforms", "cpu")
        args.logn, args.levels, args.iters = 12, 8, 3
    try:
        if args.metric == "bootstrap":
            if args.levels < 20:
                args.levels = max(args.levels, 22)
            res = bench_bootstrap(args)
        else:
            res = bench_mult_relin(args)
    except RuntimeError as e:
        # The axon TPU tunnel sometimes refuses backend init transiently
        # (round-4 driver bench died on exactly this). JAX caches the
        # failed-backend state in-process, so retry via re-exec with
        # backoff before giving up.
        if "backend" not in str(e).lower():
            raise
        tries = int(os.environ.get("BENCH_BACKEND_RETRIES", "0"))
        if tries >= 3:
            # TPU unreachable after retries (the axon tunnel can wedge for
            # hours — it killed the round-4 driver bench). Emit an honest,
            # clearly-labeled CPU-fallback line rather than a crash: the
            # metric name carries the caveat; vs_baseline is omitted.
            print(f"# backend unavailable after {tries} retries; "
                  "CPU fallback at reduced ring", file=sys.stderr)
            os.execv(sys.executable,
                     [sys.executable] + sys.argv + ["--cpu-fallback"])
        print(f"# backend init failed ({e}); retry {tries + 1}/3 in 120s",
              file=sys.stderr)
        time.sleep(120)
        os.environ["BENCH_BACKEND_RETRIES"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    if args.cpu_fallback:
        res["metric"] += "_CPU_FALLBACK_TPU_UNAVAILABLE"
        res["vs_baseline"] = 0.0
    print(json.dumps(res))


if __name__ == "__main__":
    main()
