"""KV-cache slot augmentation for autoregressive decode.

Counterpart of the reference's optimize.cpp:3-39 (augment_value_row/col) and
the cache update in attentionLayer (layers.cpp:44-50): the cached K/V
activation ciphertexts are updated in place by masking out the slot row of
the new token and adding the freshly projected row.

In the diagonal-form attention (nn/layers.py) the cache holds K and V in the
standard activation layout, so augmentation is a single mask-multiply + add
per cache tensor; growing context is slot augmentation, not resharding
(SURVEY §5 long-context note).
"""

from __future__ import annotations

import numpy as np

from .layers import GPT2Shapes


def row_masks(sh: GPT2Shapes, row: int) -> tuple[np.ndarray, np.ndarray]:
    """(keep_mask, row_mask) over the act layout for one sequence row."""
    keep = np.ones((sh.act.n_cts, sh.slots))
    sel = np.zeros((sh.act.n_cts, sh.slots))
    r = np.full(sh.hidden, row)
    c = np.arange(sh.hidden)
    ct, sl = sh.act.place(r, c)
    keep[ct, sl] = 0.0
    sel[ct, sl] = 1.0
    return keep, sel


def augment(B, cache: list, new: list, sh: GPT2Shapes, row: int) -> list:
    """cache' = cache·(1 − row mask) + new·(row mask) — insert the new
    token's projected row into the cached K or V activation cts."""
    keep, sel = row_masks(sh, row)
    out = []
    for i, (c, n) in enumerate(zip(cache, new)):
        out.append(B.add(B.mul_plain(c, keep[i]), B.mul_plain(n, sel[i])))
    return out
