"""Multi-chip sharding for CKKS evaluation (jax.sharding over a Mesh).

The reference is single-process CPU (SURVEY §2.7) — its only parallelism is
OpenMP threads. Here the scaling axes are native to the RNS-CKKS data model:

  * ``data``  — ciphertext batch axis (images / sequences / packed-ct groups):
    pure data parallelism, no cross-chip traffic inside ops.
  * ``limb``  — the RNS limb axis: keyswitch digit MACs and NTTs are
    elementwise per limb; the digit reduction (mod_sum over the digit axis)
    becomes a psum over ICI when limbs are sharded.
  * ``coeff`` — the polynomial coefficient axis: NTT butterfly stages
    exchange across chips (XLA inserts all-to-alls for the reshape-based
    stages under SPMD).

Ciphertext arrays are [k, *batch, l, N]; the default production layout
shards batch over ``data`` and limbs over ``limb``, keeping N contiguous
per chip (NTT stays local; the keyswitch inner NTT batch is the big win).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 1, n_limb: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert n_data * n_limb <= len(devices)
    dev = np.array(devices[: n_data * n_limb]).reshape(n_data, n_limb)
    return Mesh(dev, axis_names=("data", "limb"))


def ct_sharding(mesh: Mesh, batch_ndim: int = 1) -> NamedSharding:
    """Sharding for ciphertext data [k, *batch, l, N]: batch over 'data',
    limbs over 'limb', coefficients local."""
    spec = P(None, *(("data",) + (None,) * (batch_ndim - 1)), "limb", None) \
        if batch_ndim else P(None, "limb", None)
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ciphertext(ct, mesh: Mesh):
    """Place a Ciphertext's data according to the default layout."""
    from ..core.evaluator import Ciphertext
    batch_ndim = ct.data.ndim - 3
    return Ciphertext(
        jax.device_put(ct.data, ct_sharding(mesh, batch_ndim)), ct.scale)
