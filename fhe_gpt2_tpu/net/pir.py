"""Private embedding lookup (PIR) under CKKS.

Counterpart of the reference's vendored vectorized BatchPIR
(network/header/batchpirserver.h, BFV + cuckoo hashing) in this framework's
idiom: the client encrypts a one-hot selector over the vocabulary; the server
evaluates selector @ E as a slot-linear transform (BSGS LT engine), returning
the encrypted embedding row without learning the token id.

This is the simple single-server homomorphic-dot PIR — functionally
equivalent for the private-embedding use case (full cuckoo-hashed BatchPIR
with query packing is roadmap for a later round; see PARITY.md gaps).
"""

from __future__ import annotations

import numpy as np

from ..nn.linear import LTSpec, apply_lt, lt_from_triples


class EmbeddingPIRServer:
    """Holds the public embedding table; answers encrypted one-hot queries."""

    def __init__(self, table: np.ndarray, slots: int, giant=None):
        self.table = np.asarray(table, dtype=np.float64)   # [V, d]
        V, d = self.table.shape
        self.slots = slots
        n_src = -(-V // slots)
        assert d <= slots
        v_idx = np.repeat(np.arange(V), d)
        c_idx = np.tile(np.arange(d), V)
        spec = lt_from_triples(
            slots, n_src, 1,
            np.zeros_like(c_idx), c_idx,
            v_idx // slots, v_idx % slots,
            self.table[v_idx, c_idx], name="pir")
        self.plan = spec.bsgs_plan(giant)

    def required_steps(self):
        steps = set(a for a in self.plan.baby_amounts if a)
        steps |= {jg for jg in self.plan.groups if jg}
        return sorted(steps)

    def answer(self, B, query_cts: list):
        """query_cts: one-hot selector packed over ceil(V/slots) cts.
        Returns one ct with the embedding row in slots [0, d)."""
        [out] = apply_lt(B, self.plan, query_cts)
        return out


def make_query(token_id: int, vocab: int, slots: int) -> np.ndarray:
    """Client-side one-hot selector, host format [n_cts, slots]."""
    n = -(-vocab // slots)
    q = np.zeros((n, slots))
    q[token_id // slots, token_id % slots] = 1.0
    return q
