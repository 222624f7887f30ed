"""Encrypted ResNet CIFAR inference driver.

Counterpart of the reference's run/run_cnn.cpp (`./cnn LAYERS DATASET START
END`) + infer_seal.cpp driver: loads the reference's pretrained weights,
encrypts images, runs the encrypted forward, reports logits/labels + timing.

    python -m fhe_gpt2_tpu.run_resnet --depth 20 --images 1 [--plain]
           [--logn 15] [--levels 20]

--plain runs the slot-exact simulator (no crypto) — the fast path for
algorithm validation, like the reference's plain_approx.
"""

from __future__ import annotations

import argparse
import getpass
import json
import os
import tempfile
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), f"jax_cache_tpu_{getpass.getuser()}"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=20,
                    choices=[20, 32, 44, 56, 110])
    ap.add_argument("--dataset", default="cifar10",
                    choices=["cifar10", "cifar100"],
                    help="cifar100 = resnet32_cifar100 weights (option-B "
                         "learned downsample shortcuts, 100-way FC)")
    ap.add_argument("--images", type=int, default=1)
    ap.add_argument("--plain", action="store_true")
    ap.add_argument("--logn", type=int, default=15)
    ap.add_argument("--levels", type=int, default=None,
                    help="modulus-chain levels (default 20; 30 with "
                         "--real-boot — the bootstrap pipeline itself "
                         "consumes 18 levels, leaving L-18 after a refresh)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--nsp", type=int, default=None,
                    help="special primes (hybrid key-switch digit size); "
                         "default 1 (u64) / 3 (w32)")
    ap.add_argument("--word", type=int, default=64, choices=[32, 64],
                    help="engine word size. 32 = uint32 moduli (native TPU "
                         "int32 VPU path, 25-bit scale): at logN=15 a "
                         "30-level chain stays under the 881-bit 128-bit-"
                         "security budget — half the reference's ring for "
                         "the same depth. 64 = u64 moduli (46-bit scale, "
                         "reference-parity precision).")
    ap.add_argument("--composite", action="store_true",
                    help="uint32 engine with composite two-prime scaling "
                         "(Δ = q·q′ ≈ 2^50, Q0 ≈ 2^55): u64-grade precision "
                         "at 32-bit arithmetic cost — the bootstrapped-run "
                         "engine of choice on TPU. --levels counts logical "
                         "levels (pairs).")
    ap.add_argument("--hamming", type=int, default=192,
                    help="sparse secret weight (reference: 192)")
    ap.add_argument("--boot-K", type=int, default=25,
                    help="EvalMod integer window (reference: 25 for h=192)")
    ap.add_argument("--boot-degree", type=int, default=59,
                    help="EvalMod cosine degree (reference: 59)")
    ap.add_argument("--sign-log2-err", type=float, default=None,
                    help="composite-sign target error, log2 (default: -12 "
                         "u64 / -6 w32, matched to each engine's bootstrap "
                         "noise floor)")
    ap.add_argument("--jit", action="store_true",
                    help="jit each forward segment (required on TPU)")
    ap.add_argument("--real-boot", action="store_true",
                    help="use the real CKKS bootstrap between blocks "
                         "(default: fakeBootstrap level reset, like the "
                         "reference's bring-up path util.cpp:266)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests; the axon TPU "
                         "plugin ignores JAX_PLATFORMS so this must be a "
                         "config update)")
    ap.add_argument("--data-slots", type=int, default=0,
                    help="logical slot count for the CNN packing (< ring "
                         "slots): data and masks replicate cyclically over "
                         "the ring (subring embedding) and the bootstrap "
                         "runs sparse at this count — the reference's "
                         "logn1=14-at-logN=16 regime (infer_seal.cpp:287). "
                         "ResNet tensors need only 16384 slots.")
    ap.add_argument("--digit-keys", action="store_true",
                    help="generate the base-16 digit rotation key set (~45 "
                         "keys) instead of one key per recorded amount "
                         "(~390); rotations decompose into <=4 hops "
                         "(memory_save_rotate). Required at logN=16/u64 "
                         "where exact keys exceed HBM.")
    ap.add_argument("--boot-factors", type=int, default=2,
                    help="CtS/StC factorization depth (3 = fewer masks, "
                         "2 more levels consumed)")
    ap.add_argument("--start-level", type=int, default=0,
                    help="encrypt inputs at this LOGICAL level instead of "
                         "the chain top. Set to (levels - bootstrap depth) "
                         "so the stem ReLU runs at the same level as every "
                         "post-bootstrap ReLU: one compiled ReLU program "
                         "for the whole net, and convs run near the chain "
                         "bottom where masks are limbs-cheap.")
    ap.add_argument("--headroom", type=int, default=None,
                    help="auto-bootstrap level floor in logical levels "
                         "(backend min_level_headroom; default 3). The "
                         "level-exact schedule (--start-level) runs convs "
                         "1-2 levels above base, which needs headroom<=2 "
                         "to not trigger traced mid-segment bootstraps.")
    ap.add_argument("--no-ext-hoist", action="store_true",
                    help="single-hoisted LT path: smaller traced programs. "
                         "REQUIRED at logN=15 composite rings — the "
                         "double-hoisted CtS stage's HLO exceeds the axon "
                         "remote-compile transport limit (HTTP 413).")
    ap.add_argument("--batch-images", action="store_true",
                    help="stack all --images on the ciphertext batch axis "
                         "and run ONE batched forward (amortized per-image "
                         "latency; the TPU counterpart of the reference's "
                         "50-thread OMP image loop, infer_seal.cpp:404)")
    ap.add_argument("--out", default=None,
                    help="append per-image result JSON lines to this file")
    a = ap.parse_args()
    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    if a.nsp is None:
        a.nsp = 3 if (a.word == 32 or a.composite) else 1
    if a.levels is None:
        a.levels = 30 if a.real_boot else 20

    from .approx.minimax import dp_schedule
    from .cnn import resnet as R
    from .nn import kernels as K
    from .nn.backend import PlainBackend, RecordingBackend

    t0 = time.time()
    weights = R.load_reference_weights(a.depth, a.dataset)
    slots = (1 << (a.logn - 1)) if not a.plain else 16384
    if a.data_slots:
        assert a.data_slots <= slots and slots % a.data_slots == 0
        slots = a.data_slots
    serr = a.sign_log2_err or (
        -6.0 if (a.word == 32 and not a.composite) else -12.0)
    sign = K.SignPlans.from_composite(
        dp_schedule(target_err=2.0 ** serr, eps=2.0 ** (serr + 2)))
    rp = R.build_resnet_plans(weights, a.depth, slots, sign=sign)
    print(f"# plans built in {time.time()-t0:.1f}s "
          f"({len(rp.blocks)} blocks, slots={slots})")

    rng = np.random.default_rng(a.seed)
    # CIFAR test images are stripped from the reference snapshot
    # (.MISSING_LARGE_BLOBS); random inputs exercise the full pipeline
    # and are compared against the float oracle.
    imgs = [rng.uniform(-1, 1, (3, 32, 32)) for _ in range(a.images)]
    wants = [R.forward_float(weights, a.depth, img) for img in imgs]
    results = []
    if a.plain:
        B = PlainBackend(slots)
        for i, img in enumerate(imgs):
            t0 = time.time()
            out = R.forward(B, R.pack_input(rp, img), rp, boot_between=False)
            got = R.logits_from_slots(rp, out[0])
            results.append(_result(i, got, wants[i], time.time() - t0))
            print(json.dumps(results[-1]))
    elif a.batch_images:
        # All images ride the ciphertext batch axis — every conv/ReLU/
        # bootstrap program runs ONCE for the whole batch (the TPU answer
        # to the reference's 50-thread OMP image loop, infer_seal.cpp:404).
        t0 = time.time()
        logits = _run_encrypted(a, rp, imgs)
        dt = (time.time() - t0) / len(imgs)
        for i, (got, want) in enumerate(zip(logits, wants)):
            results.append(_result(i, got, want, dt))
            print(json.dumps(results[-1]))
    else:
        for i, img in enumerate(imgs):
            t0 = time.time()
            [got] = _run_encrypted(a, rp, [img])
            results.append(_result(i, got, wants[i], time.time() - t0))
            print(json.dumps(results[-1]))
    n_ok = sum(r["match"] for r in results)
    summary = dict(depth=a.depth, dataset=a.dataset, images=a.images,
                   logn=a.logn, levels=a.levels, word=a.word,
                   composite=bool(a.composite), nsp=a.nsp,
                   real_boot=a.real_boot, jit=a.jit,
                   batch_images=bool(a.batch_images),
                   oracle_agreement=n_ok / len(results),
                   seconds_per_image=round(
                       sum(r["seconds"] for r in results) / len(results), 2))
    bt = getattr(a, "_boot_times", None)
    if bt:
        summary.update(
            n_bootstraps=len(bt),
            boot_seconds_first=round(bt[0], 2),          # includes compile
            boot_seconds_min=round(min(bt), 3),
            boot_seconds_mean_steady=round(
                sum(bt[1:]) / (len(bt) - 1), 3)
            if len(bt) > 1 else round(bt[0], 3))
    print(json.dumps(summary))
    if a.out:
        with open(a.out, "a") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")
            f.write(json.dumps(summary) + "\n")


def _result(i, got, want, dt):
    return dict(image=i, seconds=round(dt, 2), label=int(np.argmax(got)),
                oracle_label=int(np.argmax(want)),
                match=bool(np.argmax(got) == np.argmax(want)),
                logit_mae=round(float(np.abs(got - want).mean()), 5))


def _run_encrypted(a, rp, imgs):
    """Encrypted forward over `imgs` (stacked on the ct batch axis when
    len > 1). Returns per-image logits."""
    import jax
    from .cnn import resnet as R
    from .core.context import CkksContext, CkksParams
    from .core.evaluator import Decryptor, Encryptor, Evaluator
    from .core.keys import KeyGenerator
    from .nn.backend import CkksBackend, RecordingBackend

    def log(msg):
        print(f"# [{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    rec = RecordingBackend(rp.slots)
    R.forward(rec, R.pack_input(rp, imgs[0]), rp, boot_between=False)
    log("rotation recording done")
    ss = a.data_slots if a.data_slots else 0
    if a.composite:
        params = CkksParams.create_composite(
            logn=a.logn, num_levels=a.levels, log_scale=50, log_q0=55,
            log_special=31, num_special=a.nsp, hamming_weight=a.hamming,
            sparse_slots=ss)
    elif a.word == 32:
        params = CkksParams.create(
            logn=a.logn, log_q0=29, log_scale=25, num_levels=a.levels,
            log_special=31, num_special=a.nsp, hamming_weight=a.hamming,
            sparse_slots=ss)
    else:
        params = CkksParams.create(
            logn=a.logn, log_q0=51, log_scale=46, num_levels=a.levels,
            log_special=51, num_special=a.nsp, hamming_weight=a.hamming,
            sparse_slots=ss)
    ctx = CkksContext(params)
    log(f"context built: {ctx.L} limbs + {ctx.k_sp} special")
    lvl = len(params.moduli) if a.composite else a.levels
    if a.start_level:
        lvl = ctx.base_limbs + a.start_level * ctx.rescale_limbs
    kg = KeyGenerator(ctx, seed=1)
    ev = Evaluator(ctx, relin_key=kg.relin_key())
    enc = Encryptor(ctx, secret=kg.secret, seed=2)
    dec = Decryptor(ctx, kg.secret)
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=dec, default_level=lvl,
                    no_ext_hoist=bool(a.no_ext_hoist))
    if a.headroom is not None:
        B.min_level_headroom = a.headroom
    log("relin key done")
    steps = set(rec.key_steps())
    if a.real_boot:
        from .boot.bootstrap import Bootstrapper, make_evalmod
        # EvalMod window: eps is the actual Δ/q0 of the parameter set; K
        # covers the modraise overshoot of the h-sparse secret
        # (infer_seal.cpp:287-322 — the reference uses K=25 for h=192).
        eps = params.scale / ctx.q0_float
        em = make_evalmod(K=a.boot_K, eps=max(eps * 1.05, 2 ** -5),
                          degree=a.boot_degree, arcsin_degree=3, prec_dps=80)
        B.boot = Bootstrapper(B, evalmod=em, cts_factors=a.boot_factors,
                              stc_factors=a.boot_factors)
        steps.update(B.boot.required_steps())
    if a.digit_keys:
        # Base-16 digit set only (~45 keys): every rotation — model AND
        # bootstrap — decomposes into <=4 hops. Exact-step keys at
        # logN=16/u64 exceed HBM (389 steps x ~190 MB).
        from .core.keys import digit_steps
        steps = set(digit_steps(ctx.params.slots, base=16))
    t0 = time.time()
    ev.galois_keys = kg.galois_keys(steps=sorted(steps), conjugate=True)
    log(f"galois keygen done: {len(steps)} keys in {time.time()-t0:.0f}s")
    # Per-bootstrap wall-clock telemetry: the recorded run IS the bootstrap
    # benchmark (run_bootstrapping.cpp counterpart) — steady-state times
    # land in the summary as boot_seconds_{first,min,mean}.
    if B.boot is not None:
        boot_times = []
        inner = B.bootstrap

        def timed_boot(v, **kw):
            import jax
            t0 = time.time()
            out = inner(v, **kw)
            jax.block_until_ready(out.data)
            boot_times.append(time.time() - t0)
            log(f"bootstrap #{len(boot_times)}: {boot_times[-1]:.2f}s "
                f"(level {v.level} -> {out.level})")
            return out

        B.bootstrap = timed_boot
        a._boot_times = boot_times
    packed = [R.pack_input(rp, img) for img in imgs]     # [n_img][n_cts]
    if len(imgs) == 1:
        xs = [B.from_slots(v) for v in packed[0]]
    else:
        xs = [B.from_slots(np.stack([p[i] for p in packed]))
              for i in range(len(packed[0]))]
    out = R.forward(B, xs, rp, jit=a.jit)
    slots_out = B.to_slots(out[0])
    if len(imgs) == 1:
        return [R.logits_from_slots(rp, slots_out)]
    return [R.logits_from_slots(rp, slots_out[i]) for i in range(len(imgs))]


if __name__ == "__main__":
    main()
