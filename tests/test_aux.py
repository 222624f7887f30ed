"""Aux subsystems: KV-cache augmentation, telemetry."""

import numpy as np

from fhe_gpt2_tpu.nn import kvcache, layers as L
from fhe_gpt2_tpu.nn.backend import PlainBackend
from fhe_gpt2_tpu.utils.telemetry import TelemetryBackend


SH = L.GPT2Shapes(slots=512, seq=8, hidden=16, heads=2)


def test_kvcache_augment():
    rng = np.random.default_rng(0)
    B = PlainBackend(SH.slots)
    cache_mat = rng.standard_normal((SH.seq, SH.hidden))
    new_mat = rng.standard_normal((SH.seq, SH.hidden))
    cache = list(SH.act.pack(cache_mat))
    new = list(SH.act.pack(new_mat))
    out = kvcache.augment(B, cache, new, SH, row=3)
    got = SH.act.unpack(np.stack(out))
    want = cache_mat.copy()
    want[3] = new_mat[3]
    assert np.allclose(got, want, atol=1e-12)


def test_telemetry_wrapper():
    rng = np.random.default_rng(1)
    B = TelemetryBackend(PlainBackend(SH.slots))
    x = rng.standard_normal(SH.slots)
    y = B.mul(B.add(x, x), B.rotate(x, 4))
    _ = B.square(y)
    rep = B.report()
    assert B.stats["add"].count == 1
    assert B.stats["rotate"].count == 1
    assert B.stats["mul"].count == 1
    assert "rotate" in rep and "TOTAL" in rep
    assert len(B.level_trajectory()) == 4
