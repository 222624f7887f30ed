"""Secure-inference network layer: serialization + gRPC loopback."""

import numpy as np
import pytest

from fhe_gpt2_tpu.core.context import CkksContext, CkksParams
from fhe_gpt2_tpu.core.evaluator import Decryptor, Encryptor, Evaluator
from fhe_gpt2_tpu.core.keys import KeyGenerator
from fhe_gpt2_tpu.net import serialize as S


@pytest.fixture(scope="module")
def setup():
    params = CkksParams.create(
        logn=9, log_q0=50, log_scale=40, num_levels=3,
        log_special=51, hamming_weight=16)
    ctx = CkksContext(params)
    kg = KeyGenerator(ctx, seed=2)
    ev = Evaluator(ctx, relin_key=kg.relin_key(),
                   galois_keys=kg.galois_keys(steps=[1]))
    enc = Encryptor(ctx, secret=kg.secret, seed=3)
    dec = Decryptor(ctx, kg.secret)
    return params, ctx, kg, ev, enc, dec


def test_serialize_roundtrips(setup):
    params, ctx, kg, ev, enc, dec = setup
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, ctx.params.slots)
    ct = enc.encrypt(ev.make_plain(z, params.scale, 3))
    ct2 = S.load_ciphertext(S.dump_ciphertext(ct))
    assert ct2.scale == ct.scale
    assert np.allclose(dec.decrypt(ct2), z, atol=1e-6)
    p2 = S.load_params(S.dump_params(params))
    assert p2 == params
    rk2 = S.load_kswitch_key(S.dump_kswitch_key(ev.relin_key))
    assert (np.asarray(rk2.data) == np.asarray(ev.relin_key.data)).all()
    gk2 = S.load_galois_keys(S.dump_galois_keys(ev.galois_keys))
    assert set(gk2.keys) == set(ev.galois_keys.keys)


def test_grpc_loopback(setup):
    grpc = pytest.importorskip("grpc")
    from fhe_gpt2_tpu.net.service import (
        SecureInferenceClient, SecureInferenceServer,
    )
    params, ctx, kg, ev, enc, dec = setup

    def model(B, ct):
        # Encrypted x² + rotate(x, 1) on the server side.
        return B.add(B.square(ct), B.rotate(ct, 1))

    server = SecureInferenceServer(model_fn=model, port=0).start()
    try:
        client = SecureInferenceClient(f"localhost:{server.port}")
        client.init_session(params, relin_key=ev.relin_key,
                            galois_keys=ev.galois_keys)
        rng = np.random.default_rng(1)
        z = rng.uniform(-1, 1, ctx.params.slots)
        ct = enc.encrypt(ev.make_plain(z, params.scale, 3))
        out = client.evaluate(ct)
        got = dec.decrypt(out)
        want = z * z + np.roll(z, -1)
        assert np.allclose(got, want, atol=1e-4)
    finally:
        server.stop()


def test_pir_embedding_lookup(setup):
    """Private embedding lookup: encrypted one-hot -> embedding row."""
    from fhe_gpt2_tpu.net.pir import EmbeddingPIRServer, make_query
    from fhe_gpt2_tpu.nn.backend import CkksBackend, PlainBackend
    params, ctx, kg, ev, enc, dec = setup
    rng = np.random.default_rng(7)
    V, d = 600, 32                       # vocab spans 3 cts at 256 slots
    table = rng.standard_normal((V, d))
    slots = ctx.params.slots
    srv = EmbeddingPIRServer(table, slots)
    # Plain check first.
    Bp = PlainBackend(slots)
    q = make_query(123, V, slots)
    out_p = srv.answer(Bp, list(q))
    assert np.allclose(out_p[:d], table[123], atol=1e-10)
    # Encrypted.
    ev2 = Evaluator(ctx, relin_key=ev.relin_key,
                    galois_keys=kg.galois_keys(steps=srv.required_steps()))
    B = CkksBackend(ctx=ctx, ev=ev2, enc=enc, dec=dec, default_level=3)
    cts = [B.from_slots(row) for row in q]
    out = srv.answer(B, cts)
    got = B.to_slots(out)[:d]
    assert np.allclose(got, table[123], atol=1e-3)


def test_seeded_ciphertext_roundtrip():
    """Seeded fresh-ct form: half the payload, exact decrypt after reload."""
    from fhe_gpt2_tpu.net.serialize import (
        dump_ciphertext, dump_ciphertext_seeded, load_ciphertext_seeded)

    params = CkksParams.create(logn=9, log_q0=50, log_scale=40, num_levels=3,
                               log_special=51, hamming_weight=32)
    ctx = CkksContext(params)
    kg = KeyGenerator(ctx, seed=3)
    ev = Evaluator(ctx)
    enc = Encryptor(ctx, secret=kg.secret, seed=4)
    dec = Decryptor(ctx, kg.secret)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, ctx.params.slots)
    pt = ev.make_plain(x, params.scale, 3)
    ct, seed = enc.encrypt_symmetric_seeded(pt)
    blob = dump_ciphertext_seeded(ct, seed)
    full = dump_ciphertext(ct)
    assert len(blob) < 0.6 * len(full), (len(blob), len(full))
    back = load_ciphertext_seeded(blob, ctx)
    assert np.array_equal(np.asarray(back.data), np.asarray(ct.data))
    assert np.abs(np.real(dec.decrypt(back)) - x).max() < 1e-8


def test_batch_pir_encrypted():
    """Vectorized BatchPIR: 6 private lookups in one round, encrypted query,
    cuckoo-hashed buckets, answers vs the table (batchpirserver.h parity)."""
    from fhe_gpt2_tpu.net.pir import BatchPIRClient, BatchPIRServer
    from fhe_gpt2_tpu.nn.backend import CkksBackend

    slots = 256
    vocab, d, batch = 120, 8, 6
    rng = np.random.default_rng(3)
    table = rng.standard_normal((vocab, d))
    srv = BatchPIRServer(table, slots, batch_size=batch)
    cli = BatchPIRClient(vocab, slots, batch, d)
    assert srv.st == cli.st and srv.n_cts == cli.n_cts

    params = CkksParams.create(logn=9, log_q0=50, log_scale=40, num_levels=4,
                               log_special=51, hamming_weight=32)
    ctx = CkksContext(params)
    kg = KeyGenerator(ctx, seed=5)
    ev = Evaluator(ctx, relin_key=kg.relin_key(),
                   galois_keys=kg.galois_keys(steps=srv.required_steps()))
    enc = Encryptor(ctx, secret=kg.secret, seed=6)
    dec = Decryptor(ctx, kg.secret)
    B = CkksBackend(ctx=ctx, ev=ev, enc=enc, dec=dec, default_level=4)

    tokens = [3, 77, 31, 119, 0, 64]
    q, asg = cli.make_queries(tokens)
    assert len({asg[t] for t in tokens}) == batch   # distinct buckets
    q_enc = [B.from_slots(row) for row in q]
    ans = srv.answer(B, q_enc)
    ans_np = np.stack([B.to_slots(a) for a in ans])
    rows = cli.extract(ans_np, asg, tokens)
    assert np.abs(rows - table[tokens]).max() < 1e-4


def test_grpc_streaming_loopback(setup):
    """Streaming key upload + bidi evaluate loop (RepackAndSend parity)."""
    grpc = pytest.importorskip("grpc")
    from fhe_gpt2_tpu.net.service import (
        SecureInferenceClient, SecureInferenceServer,
    )
    params, ctx, kg, ev, enc, dec = setup

    def model(B, ct):
        return B.add(B.square(ct), B.rotate(ct, 1))

    server = SecureInferenceServer(model_fn=model, port=0).start()
    try:
        client = SecureInferenceClient(f"localhost:{server.port}")
        client.init_session_stream(params, relin_key=ev.relin_key,
                                   galois_keys=ev.galois_keys)
        rng = np.random.default_rng(2)
        zs = [rng.uniform(-1, 1, ctx.params.slots) for _ in range(3)]
        cts = [enc.encrypt(ev.make_plain(z, params.scale, 3)) for z in zs]
        outs = client.evaluate_stream(cts)
        for z, out in zip(zs, outs):
            got = dec.decrypt(out)
            assert np.allclose(got, z * z + np.roll(z, -1), atol=1e-4)
    finally:
        server.stop()
