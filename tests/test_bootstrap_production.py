"""Production-parameter EvalMod exercised in CI (VERDICT r3 item 2).

The reference's bootstrap accuracy harness (run_bootstrapping.cpp:145-222)
runs K=25 / cos degree 59 / h-sparse secrets; the fast bootstrap tests only
ever used the toy K=12/deg45 window. This pins the production polynomial at
a mid ring on the u64 engine (the engine of record for bootstrapped runs —
see README noise-floor note; w32 at this ring sits at its structural
~1e-1 floor and is exercised by the diagnostic sweeps, not CI).
"""

import numpy as np
import pytest

from fhe_gpt2_tpu.boot.bootstrap import Bootstrapper, make_evalmod
from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
from fhe_gpt2_tpu.core.evaluator import Decryptor, Encryptor, Evaluator
from fhe_gpt2_tpu.core.keys import KeyGenerator
from fhe_gpt2_tpu.nn.backend import CkksBackend


@pytest.mark.slow
def test_bootstrap_production_evalmod_u64():
    LOGN, NS, LEVELS, H = 13, 1024, 22, 64
    params = CkksParams.create(
        logn=LOGN, log_q0=51, log_scale=46, num_levels=LEVELS,
        log_special=51, num_special=2, hamming_weight=H, sparse_slots=NS)
    ctx = CkksContext(params)
    kg = KeyGenerator(ctx, seed=3)
    enc = Encryptor(ctx, secret=kg.secret, seed=4)
    dec = Decryptor(ctx, kg.secret)
    ev = Evaluator(ctx, relin_key=kg.relin_key())
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=dec, default_level=LEVELS)
    eps = params.scale / float(ctx.moduli[0])      # 2^-5, the reference's
    em = make_evalmod(K=25, eps=max(eps * 1.05, 2 ** -5), degree=59,
                      arcsin_degree=3, prec_dps=80)
    boot = Bootstrapper(B, num_slots=NS, evalmod=em)
    ev.galois_keys = kg.galois_keys(steps=boot.required_steps(),
                                    conjugate=True)
    rng = np.random.default_rng(5)
    z = rng.uniform(-1, 1, NS)
    ct = enc.encrypt(ev.make_plain(z, params.scale, 1))
    out = boot.bootstrap(ct)
    assert out.level >= 4, out.level
    back = np.real(dec.decrypt(out, num_slots=NS))
    err = np.abs(back - z)
    print(f"u64 production bootstrap: mean {err.mean():.2e} "
          f"max {err.max():.2e} out-level {out.level}")
    # The reference-grade regime: mean abs err well below 1e-3 at 46-bit
    # scale (run_bootstrapping.cpp error metric; u64 logN=12 measured
    # 1.16e-4 in the r4 sweeps).
    assert err.mean() < 1e-3, err.mean()
