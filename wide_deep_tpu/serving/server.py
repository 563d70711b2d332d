"""Scoring server: gRPC + raw-TCP transports over one compiled model.

Replaces ``tensorflow_model_server`` (reference scripts/run_serving.sh:60-70)
with a wide_deep_tpu-native server: an export bundle is loaded once, the
predict function is jit-compiled for a fixed max batch, and requests (TSV
rows) run through the same native feature transformer as training.

Transports (see serving/protocol.py): gRPC generic method for the Python
client / load harness, and a length-prefixed TCP endpoint for the native C++
client (cpp/serving_client.cc).
"""

from __future__ import annotations

import concurrent.futures as futures
import logging
import os
import socket
import threading
from typing import Dict, List, Optional

import jax
import numpy as np

from wide_deep_tpu.features.pipeline import default_transformer
from wide_deep_tpu.serving import protocol
from wide_deep_tpu.serving.export import load_bundle

log = logging.getLogger("wide_deep_tpu.serving")


class ServingModel:
    """A loaded bundle + compiled predict path."""

    def __init__(self, version_dir: str, max_batch_size: int = 1024,
                 model_name: str = "wide_deep"):
        self.model, self.params, self.mstate, self.bundle = load_bundle(
            version_dir)
        self.version = os.path.basename(version_dir.rstrip("/"))
        self.model_name = model_name
        self.max_batch_size = max_batch_size
        # small requests run in the smallest fitting bucket instead of paying
        # a full max-batch forward (jit caches one executable per shape)
        self.batch_buckets = sorted({b for b in (16, 128, max_batch_size)
                                     if b <= max_batch_size})
        self.transformer = default_transformer(
            self.model.plan, self.bundle["n_classes"])
        self._predict = jax.jit(
            lambda p, s, b: self.model.predict(p, s, b))
        self._native = hasattr(self.transformer, "transform_text")
        self._lock = threading.Lock()

    def _bucket_for(self, n: int) -> int:
        for b in self.batch_buckets:
            if n <= b:
                return b
        return self.max_batch_size

    def warmup(self):
        for bucket in self.batch_buckets:
            spec = self.model.plan.batch_spec(bucket,
                                              self.bundle["n_classes"])
            zero = {k: np.zeros(shape, dt) for k, (shape, dt) in spec.items()}
            zero.pop("label", None); zero.pop("weight", None)
            self._predict(self.params, self.mstate, zero)

    def score_rows(self, rows: List[str]) -> Dict:
        """TSV rows -> {"scores": [[...]], "class_ids": [...], "valid": [...]}.

        Rows are validated (column count) BEFORE batching so malformed rows
        can't shift the alignment of the packed batch; they come back with
        ``valid[i] = false`` and zero scores.
        """
        ncols = len(self.model.plan.columns)
        n_rows = len(rows)
        n_classes = self.bundle["n_classes"]
        scores: List[List[float]] = [[0.0] * n_classes
                                     for _ in range(n_rows)]
        class_ids: List[int] = [0] * n_rows
        valid: List[bool] = [False] * n_rows
        keep = [(i, r) for i, r in enumerate(rows)
                if r.count("\t") + 1 in (ncols, ncols - 1)]
        for start in range(0, len(keep), self.max_batch_size):
            chunk = keep[start:start + self.max_batch_size]
            n = len(chunk)
            bucket = self._bucket_for(n)
            if self._native:
                text = "\n".join(r for _, r in chunk).encode(
                    "utf-8", errors="replace")
                batch = self.transformer.transform_text(
                    text, n, bucket, mode="pred")
            else:
                cells = [r.split("\t") for _, r in chunk]
                cells = [([""] + c) if len(c) == ncols - 1 else c
                         for c in cells]
                batch = self.transformer.transform(
                    cells, bucket, mode="pred")
            with self._lock:
                preds = self._predict(self.params, self.mstate, batch)
            probs = np.asarray(preds["probabilities"])
            ids = np.asarray(preds["class_ids"])
            for j, (orig, _) in enumerate(chunk):
                scores[orig] = list(map(float, probs[j]))
                class_ids[orig] = int(ids[j])
                valid[orig] = True
        return {"model_name": self.model_name, "scores": scores,
                "class_ids": class_ids, "valid": valid,
                "model_version": getattr(self, "version", None)}

    def handle_request(self, payload: bytes) -> bytes:
        try:
            req = protocol.decode_request(payload)
            if req.get("model_name") not in (None, "", self.model_name):
                return protocol.encode_response(
                    {"error": f"unknown model {req.get('model_name')!r}"})
            return protocol.encode_response(self.score_rows(req["rows"]))
        except Exception as e:  # noqa: BLE001 — serving boundary
            log.exception("request failed")
            return protocol.encode_response({"error": str(e)})


class PredictorServer:
    """Runs gRPC and TCP endpoints for one ServingModel.

    With ``model_base_path`` set, a background poller hot-reloads the model
    when a newer version directory appears (TF-Serving version-watch parity):
    the new bundle is loaded and warmed before the atomic swap, so in-flight
    requests never see a cold model."""

    def __init__(self, model: ServingModel, port: int = 8500,
                 tcp_port: Optional[int] = None, workers: int = 8,
                 model_base_path: Optional[str] = None,
                 reload_interval_s: float = 10.0):
        self.model = model
        self.port = port
        self.tcp_port = tcp_port if tcp_port is not None else port + 1
        self.workers = workers
        self.model_base_path = model_base_path
        self.reload_interval_s = reload_interval_s
        self._grpc_server = None
        self._tcp_sock = None
        self._tcp_thread = None
        self._reload_thread = None
        self._stop = threading.Event()

    # ------------------------------------------------------------ hot reload
    def _reload_loop(self):
        from wide_deep_tpu.serving.export import latest_version_dir
        while not self._stop.wait(self.reload_interval_s):
            try:
                latest = latest_version_dir(self.model_base_path)
            except (FileNotFoundError, OSError):
                continue
            if os.path.basename(latest.rstrip("/")) == self.model.version:
                continue
            try:
                log.info("loading new model version from %s", latest)
                new_model = ServingModel(latest, self.model.max_batch_size,
                                         self.model.model_name)
                new_model.warmup()
                self.model = new_model  # atomic reference swap
                log.info("now serving version %s", new_model.version)
            except Exception:  # noqa: BLE001 — keep serving the old version
                log.exception("hot reload failed; keeping version %s",
                              self.model.version)

    # ------------------------------------------------------------------ gRPC
    def _build_grpc(self):
        import grpc

        outer = self

        class Handler(grpc.GenericRpcHandler):
            def service(self, handler_call_details):
                if handler_call_details.method != protocol.GRPC_METHOD:
                    return None
                return grpc.unary_unary_rpc_method_handler(
                    lambda req, ctx: outer.model.handle_request(req),
                    request_deserializer=lambda b: b,
                    response_serializer=lambda b: b)

        server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=self.workers))
        server.add_generic_rpc_handlers((Handler(),))
        server.add_insecure_port(f"[::]:{self.port}")
        return server

    # ------------------------------------------------------------------- TCP
    def _tcp_loop(self):
        self._tcp_sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._tcp_sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._tcp_sock.bind(("0.0.0.0", self.tcp_port))
        self._tcp_sock.listen(16)
        self._tcp_sock.settimeout(0.5)
        pool = futures.ThreadPoolExecutor(max_workers=self.workers)
        while not self._stop.is_set():
            try:
                conn, _ = self._tcp_sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            pool.submit(self._tcp_conn, conn)
        pool.shutdown(wait=False)

    def _tcp_conn(self, conn: socket.socket):
        try:
            with conn:
                while not self._stop.is_set():
                    try:
                        payload = protocol.recv_frame(conn)
                    except IOError:
                        return
                    protocol.send_frame(conn,
                                        self.model.handle_request(payload))
        except Exception:  # noqa: BLE001
            log.exception("tcp connection error")

    # ----------------------------------------------------------------- start
    def start(self):
        self._grpc_server = self._build_grpc()
        self._grpc_server.start()
        self._tcp_thread = threading.Thread(target=self._tcp_loop,
                                            daemon=True)
        self._tcp_thread.start()
        if self.model_base_path:
            self._reload_thread = threading.Thread(target=self._reload_loop,
                                                   daemon=True)
            self._reload_thread.start()
        log.info("serving %s (version %s): grpc :%d, tcp :%d",
                 self.model.model_name, self.model.version, self.port,
                 self.tcp_port)

    def wait(self):
        self._grpc_server.wait_for_termination()

    def stop(self, grace: float = 1.0):
        self._stop.set()
        if self._grpc_server:
            self._grpc_server.stop(grace)
        if self._tcp_sock:
            try:
                self._tcp_sock.close()
            except OSError:
                pass
        if self._tcp_thread:
            self._tcp_thread.join(timeout=2.0)
