"""Native runtime (libckksrt) vs numpy reference paths."""

import numpy as np
import pytest

from fhe_gpt2_tpu.core import embedding
from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
from fhe_gpt2_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(CkksParams.create(
        logn=9, log_q0=50, log_scale=40, num_levels=3, log_special=51))


def test_native_encode_matches_numpy(ctx):
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, ctx.params.slots) + 1j * rng.uniform(-1, 1, ctx.params.slots)
    limbs = (0, 1, 2)
    got = embedding.encode(z, 2.0 ** 40, ctx, limbs)          # native path
    want = embedding.coeffs_to_rns(
        embedding.encode_to_coeffs(z, 2.0 ** 40, ctx), ctx, limbs)
    assert (got == want).all()


def test_native_crt_compose(ctx):
    rng = np.random.default_rng(1)
    z = rng.uniform(-1, 1, ctx.params.slots)
    limbs = (0, 1, 2)
    res = embedding.encode(z, 2.0 ** 40, ctx, limbs)
    back = embedding.decode(res, 2.0 ** 40, ctx, limbs)        # native path
    assert np.allclose(back, z, atol=1e-9)


def test_native_compress_roundtrip():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 255, 100000, dtype=np.uint8).tobytes() + b"\0" * 50000
    blob = native.compress(data)
    assert len(blob) < len(data)
    assert native.decompress(blob, len(data)) == data
