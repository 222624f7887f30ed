"""Secure-inference gRPC service: client keeps the secret key, the server
evaluates on ciphertexts.

Counterpart of the reference's SecureInference service
(protos/secure_inference.proto:6-18, network/secure_inference_server.cc:24-214,
client .cc): InitSession uploads params + evaluation keys, Evaluate streams
ciphertexts through a server-registered encrypted model function. Messages
are our framed blobs (net/serialize.py) over raw-bytes gRPC methods (generic
handlers — no codegen dependency), with the reference's large message caps.
"""

from __future__ import annotations

from concurrent import futures
from dataclasses import dataclass, field
from typing import Callable, Optional

from . import serialize as S

_SERVICE = "fhegpt2tpu.SecureInference"
_MAX_MSG = 1_500_000_000   # the reference's 1.42 GB caps (server.cc:202-203)


def _bytes_io(f):
    import grpc
    return grpc.unary_unary_rpc_method_handler(
        f, request_deserializer=lambda b: b, response_serializer=lambda b: b)


@dataclass
class SecureInferenceServer:
    """Evaluator-side server. `model_fn(backend, ct) -> ct` is the encrypted
    computation run per Evaluate call (registered host-side)."""

    model_fn: Callable
    port: int = 50051
    _state: dict = field(default_factory=dict)

    def _init_session(self, request: bytes, ctx) -> bytes:
        import jax
        from ..core.context import CkksContext
        from ..core.evaluator import Evaluator
        from ..nn.backend import CkksBackend
        off = 0
        blobs = []
        while off < len(request):
            import struct
            hlen, clen, _ = struct.unpack("<III", request[off + 4:off + 16])
            size = 16 + hlen + clen
            blobs.append(request[off:off + size])
            off += size
        params = S.load_params(blobs[0])
        relin = S.load_kswitch_key(blobs[1]) if len(blobs) > 1 else None
        galois = S.load_galois_keys(blobs[2]) if len(blobs) > 2 else None
        cctx = CkksContext(params)
        ev = Evaluator(cctx, relin_key=relin, galois_keys=galois)
        self._state["backend"] = CkksBackend(ctx=cctx, ev=ev)
        return b"ok"

    def _evaluate(self, request: bytes, ctx) -> bytes:
        B = self._state["backend"]
        ct = S.load_ciphertext(request)
        out = self.model_fn(B, ct)
        return S.dump_ciphertext(out)

    def _init_session_stream(self, request_iter, ctx) -> bytes:
        """Client-streaming key upload: one framed blob per message (params,
        relin ksk, individual Galois keys) — GB-scale key material never
        materializes as a single gRPC message (the reference's streaming
        upload concern, secure_inference_server.cc:94-177)."""
        from ..core.context import CkksContext
        from ..core.evaluator import Evaluator
        from ..core.keys import GaloisKeys
        from ..nn.backend import CkksBackend
        params = relin = None
        gk = GaloisKeys()
        for blob in request_iter:
            kind = S.peek_kind(blob)
            if kind == "params":
                params = S.load_params(blob)
            elif kind == "ksk":
                relin = S.load_kswitch_key(blob)
            elif kind == "gal_elt":
                elt, k = S.load_galois_elt(blob)
                gk.keys[elt] = k
        assert params is not None, "stream must include params"
        cctx = CkksContext(params)
        ev = Evaluator(cctx, relin_key=relin,
                       galois_keys=gk if gk.keys else None)
        self._state["backend"] = CkksBackend(ctx=cctx, ev=ev)
        return b"ok"

    def _evaluate_stream(self, request_iter, ctx):
        """Bidirectional evaluate loop — the RepackAndSend counterpart
        (secure_inference_server.cc:94-177): each inbound ciphertext is
        evaluated and the result streamed back immediately."""
        B = self._state["backend"]
        for blob in request_iter:
            out = self.model_fn(B, S.load_ciphertext(blob))
            yield S.dump_ciphertext(out)

    def start(self):
        import grpc

        def _stream_in(f):
            return grpc.stream_unary_rpc_method_handler(
                f, request_deserializer=lambda b: b,
                response_serializer=lambda b: b)

        def _stream_bidi(f):
            return grpc.stream_stream_rpc_method_handler(
                f, request_deserializer=lambda b: b,
                response_serializer=lambda b: b)

        handlers = {
            "InitSession": _bytes_io(self._init_session),
            "InitSessionStream": _stream_in(self._init_session_stream),
            "Evaluate": _bytes_io(self._evaluate),
            "EvaluateStream": _stream_bidi(self._evaluate_stream),
        }
        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=4),
            options=[("grpc.max_receive_message_length", _MAX_MSG),
                     ("grpc.max_send_message_length", _MAX_MSG)])
        self._server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(_SERVICE, handlers),))
        self.port = self._server.add_insecure_port(f"[::]:{self.port}")
        self._server.start()
        return self

    def stop(self):
        self._server.stop(None)


class SecureInferenceClient:
    """Key-owner side: builds keys locally, uploads only evaluation keys."""

    def __init__(self, address: str):
        import grpc
        self._chan = grpc.insecure_channel(
            address,
            options=[("grpc.max_receive_message_length", _MAX_MSG),
                     ("grpc.max_send_message_length", _MAX_MSG)])
        self._init = self._chan.unary_unary(
            f"/{_SERVICE}/InitSession",
            request_serializer=lambda b: b, response_deserializer=lambda b: b)
        self._init_stream = self._chan.stream_unary(
            f"/{_SERVICE}/InitSessionStream",
            request_serializer=lambda b: b, response_deserializer=lambda b: b)
        self._eval = self._chan.unary_unary(
            f"/{_SERVICE}/Evaluate",
            request_serializer=lambda b: b, response_deserializer=lambda b: b)
        self._eval_stream = self._chan.stream_stream(
            f"/{_SERVICE}/EvaluateStream",
            request_serializer=lambda b: b, response_deserializer=lambda b: b)

    def init_session(self, params, relin_key=None, galois_keys=None) -> None:
        msg = S.dump_params(params)
        if relin_key is not None:
            msg += S.dump_kswitch_key(relin_key)
        if galois_keys is not None:
            msg += S.dump_galois_keys(galois_keys)
        assert self._init(msg) == b"ok"

    def init_session_stream(self, params, relin_key=None,
                            galois_keys=None) -> None:
        """Streaming key upload: one bounded message per key component."""
        def gen():
            yield S.dump_params(params)
            if relin_key is not None:
                yield S.dump_kswitch_key(relin_key)
            if galois_keys is not None:
                for elt in sorted(galois_keys.keys):
                    yield S.dump_galois_elt(elt, galois_keys.keys[elt])
        assert self._init_stream(gen()) == b"ok"

    def evaluate(self, ct):
        return S.load_ciphertext(self._eval(S.dump_ciphertext(ct)))

    def evaluate_stream(self, cts: list) -> list:
        """Pipeline many ciphertexts through the bidi evaluate loop."""
        resp = self._eval_stream(S.dump_ciphertext(c) for c in cts)
        return [S.load_ciphertext(b) for b in resp]
