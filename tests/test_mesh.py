"""Multi-chip sharding correctness on the 8-device virtual CPU mesh.

The production layout (parallel/mesh.py) shards the ciphertext batch axis
over 'data' and the RNS limb axis over 'limb'. SPMD must be value-identical
to the single-device program: the same XLA computation with collectives
inserted, so results are compared for exact (bitwise, uint) equality.

Covers VERDICT r1 item 6: (a) limb-sharded keyswitch (rotation + relin)
correctness vs unsharded, (b) a data-sharded batched forward step.
"""

import numpy as np
import jax
import pytest

from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
from fhe_gpt2_tpu.core.evaluator import (
    Ciphertext, Decryptor, Encryptor, Evaluator, stack_cts,
)
from fhe_gpt2_tpu.core.keys import KeyGenerator
from fhe_gpt2_tpu.parallel.mesh import ct_sharding, make_mesh, \
    shard_ciphertext

LOGN = 9
LEVELS = 6
N_BATCH = 4


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    params = CkksParams.create(
        logn=LOGN, log_q0=50, log_scale=40, num_levels=LEVELS,
        log_special=51, hamming_weight=32)
    ctx = CkksContext(params)
    kg = KeyGenerator(ctx, seed=7)
    ev = Evaluator(ctx, relin_key=kg.relin_key(),
                   galois_keys=kg.galois_keys(steps=[1, 3]))
    enc = Encryptor(ctx, secret=kg.secret, seed=8)
    dec = Decryptor(ctx, kg.secret)
    rng = np.random.default_rng(9)
    zs = rng.uniform(-1, 1, (N_BATCH, ctx.params.slots))
    ct = stack_cts([enc.encrypt(ev.make_plain(z, params.scale, LEVELS))
                    for z in zs])
    return ctx, ev, dec, ct, zs


def _step(ev, scale):
    def step(data):
        c = Ciphertext(data, scale)
        m = ev.rescale(ev.multiply(c, c))      # relin keyswitch
        r = ev.rotate(m, 1)                    # galois keyswitch
        return ev.add(r, ev.rotate(m, 3)).data
    return step


def test_limb_sharded_keyswitch_matches_single_device(setup):
    """mult+relin+rescale+rotations under a (data x limb) mesh must be
    bitwise identical to the single-device run."""
    ctx, ev, dec, ct, zs = setup
    step = _step(ev, ct.scale)

    want = np.asarray(jax.jit(step)(ct.data))

    mesh = make_mesh(n_data=4, n_limb=2)
    sct = shard_ciphertext(ct, mesh)
    with mesh:
        got = jax.jit(step)(sct.data)
        jax.block_until_ready(got)
    assert np.array_equal(np.asarray(got), want), "SPMD result differs"


def test_data_sharded_batch_forward_decrypts_correctly(setup):
    """The data axis is pure DP: every batch element's decrypt must match
    the plaintext oracle after a sharded evaluate."""
    ctx, ev, dec, ct, zs = setup
    step = _step(ev, ct.scale)
    mesh = make_mesh(n_data=4, n_limb=1)
    sct = Ciphertext(jax.device_put(ct.data, ct_sharding(mesh, batch_ndim=1)),
                     ct.scale)
    with mesh:
        out = jax.jit(step)(sct.data)
        jax.block_until_ready(out)
    res = Ciphertext(np.asarray(out), ct.scale * 1.0)
    # scale after square+rescale relabel: scale^2 / q_last
    res = Ciphertext(res.data, ct.scale * ct.scale / ctx.moduli[LEVELS - 1])
    for b in range(N_BATCH):
        one = Ciphertext(res.data[:, b], res.scale)
        got = np.real(dec.decrypt(one))
        z = zs[b]
        want = np.roll(z * z, -1) + np.roll(z * z, -3)
        assert np.abs(got - want).max() < 1e-6, b
