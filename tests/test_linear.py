"""LT engine tests: specs vs dense numpy oracles on the plain backend."""

import numpy as np

from fhe_gpt2_tpu.nn.backend import PlainBackend
from fhe_gpt2_tpu.nn import formats as F
from fhe_gpt2_tpu.nn.linear import apply_lt, apply_lt_unplanned, lt_matrix_oracle


def test_matmul_tight_single_ct():
    slots, rows, d = 256, 8, 16
    rng = np.random.default_rng(0)
    A = rng.standard_normal((rows, d))
    W = rng.standard_normal((d, d))
    spec = F.matmul_tight_spec(W, rows, slots)
    lay = F.TightLayout(rows, d, slots)
    xs = lay.pack(A)
    out = lt_matrix_oracle(spec, xs)
    got = lay.unpack(out)
    assert np.allclose(got, A @ W, atol=1e-10)


def test_matmul_tight_cross_ct_boundaries():
    slots, rows, d = 64, 16, 12      # rows cross ct boundaries (64/12 fractional)
    rng = np.random.default_rng(1)
    A = rng.standard_normal((rows, d))
    W = rng.standard_normal((d, d))
    spec = F.matmul_tight_spec(W, rows, slots)
    lay = F.TightLayout(rows, d, slots)
    out = lt_matrix_oracle(spec, lay.pack(A))
    assert np.allclose(lay.unpack(out), A @ W, atol=1e-10)


def test_bsgs_equals_unplanned():
    slots, rows, d = 128, 8, 12
    rng = np.random.default_rng(2)
    A = rng.standard_normal((rows, d))
    W = rng.standard_normal((d, d))
    spec = F.matmul_tight_spec(W, rows, slots)
    lay = F.TightLayout(rows, d, slots)
    xs = list(lay.pack(A))
    B = PlainBackend(slots)
    direct = apply_lt_unplanned(B, spec, xs)
    plan = spec.bsgs_plan()
    bsgs = apply_lt(B, plan, xs)
    for a, b in zip(direct, bsgs):
        assert np.allclose(a, b, atol=1e-10)
    assert np.allclose(lay.unpack(np.stack(bsgs)), A @ W, atol=1e-10)
    # BSGS must actually reduce rotations vs one per diagonal.
    assert plan.num_rotations() < len(spec.rotation_amounts)


def test_repack_prefold_tight_roundtrip():
    slots, rows, cols = 256, 8, 12
    rng = np.random.default_rng(3)
    A = rng.standard_normal((rows, cols))
    pre = F.prefold_layout(rows, cols, slots)
    tight = F.TightLayout(rows, cols, slots)
    B = PlainBackend(slots)
    s1 = F.repack_spec(pre, tight)
    s2 = F.repack_spec(tight, pre)
    mid = apply_lt(B, s1.bsgs_plan(), list(pre.pack(A)))
    assert np.allclose(tight.unpack(np.stack(mid)), A, atol=1e-12)
    back = apply_lt(B, s2.bsgs_plan(), mid)
    assert np.allclose(pre.unpack(np.stack(back)), A, atol=1e-12)


def test_head_split_merge():
    slots, rows, d, heads = 512, 16, 24, 4
    rng = np.random.default_rng(4)
    A = rng.standard_normal((rows, d))
    spec, lhead = F.head_split_spec(rows, d, heads, slots)
    tight = F.TightLayout(rows, d, slots)
    B = PlainBackend(slots)
    outs = apply_lt(B, spec.bsgs_plan(), list(tight.pack(A)))
    dh = d // heads
    for h in range(heads):
        assert np.allclose(lhead.unpack(outs[h]), A[:, h * dh:(h + 1) * dh],
                           atol=1e-12), h
    merge = F.head_merge_spec(rows, d, heads, slots,
                              src_stride=lhead.stride, src_cols=dh)
    back = apply_lt(B, merge.bsgs_plan(), outs)
    assert np.allclose(tight.unpack(np.stack(back)), A, atol=1e-12)


def test_blocks_matmul_rectangular():
    slots, rows, d = 256, 8, 16
    K, C = 32, 48                    # 2x3 blocks of 16x16
    rng = np.random.default_rng(5)
    A = rng.standard_normal((rows, K))
    W = rng.standard_normal((K, C))
    lay = F.TightLayout(rows, d, slots)
    specs = F.blocks_matmul_specs(W, lay)
    B = PlainBackend(slots)
    groups_in = [list(lay.pack(A[:, k * d:(k + 1) * d])) for k in range(K // d)]
    outs = []
    for co in range(C // d):
        acc = None
        for ko in range(K // d):
            y = apply_lt(B, specs[ko][co].bsgs_plan(), groups_in[ko])
            acc = y if acc is None else [a + b for a, b in zip(acc, y)]
        outs.append(np.stack(acc))
    got = np.concatenate([lay.unpack(o) for o in outs], axis=1)
    assert np.allclose(got, A @ W, atol=1e-9)
