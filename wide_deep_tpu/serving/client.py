"""Python serving client + threaded load-test harness.

Parity with the reference gRPC client
(/root/reference/python/tensorflow_serving/client.py): sends TSV rows to the
scoring service and reads back per-row scores; includes the concurrency-
throttled inference benchmark the reference sketched at client.py:40-137
(built here without the dead code paths).
"""

from __future__ import annotations

import socket
import threading
import time
from typing import Dict, List, Optional

from wide_deep_tpu.serving import protocol


class PredictorClient:
    """gRPC transport (uses the generic method, no generated stubs)."""

    def __init__(self, host: str = "localhost", port: int = 8500,
                 model_name: str = "wide_deep", timeout: float = 30.0,
                 auth_token: str = None):
        import grpc
        self.model_name = model_name
        self.timeout = timeout
        self.auth_token = auth_token
        self._channel = grpc.insecure_channel(f"{host}:{port}")
        self._call = self._channel.unary_unary(
            protocol.GRPC_METHOD,
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b)

    def predict(self, rows: List[str]) -> Dict:
        payload = protocol.encode_request(rows, self.model_name,
                                          auth_token=self.auth_token)
        resp = protocol.decode_response(
            self._call(payload, timeout=self.timeout))
        if "error" in resp:
            raise RuntimeError(f"server error: {resp['error']}")
        return resp

    def close(self):
        self._channel.close()


class TcpPredictorClient:
    """Raw-TCP transport (same frames as the C++ client)."""

    def __init__(self, host: str = "localhost", port: int = 8501,
                 model_name: str = "wide_deep", timeout: float = 30.0,
                 auth_token: str = None):
        self.model_name = model_name
        self.auth_token = auth_token
        self._sock = socket.create_connection((host, port), timeout=timeout)

    def predict(self, rows: List[str]) -> Dict:
        protocol.send_frame(
            self._sock, protocol.encode_request(
                rows, self.model_name, auth_token=self.auth_token))
        resp = protocol.decode_response(protocol.recv_frame(self._sock))
        if "error" in resp:
            raise RuntimeError(f"server error: {resp['error']}")
        return resp

    def close(self):
        self._sock.close()


# ------------------------------------------------------------- load testing
class _ResultCounter:
    """Concurrency throttle + latency stats (client.py:40-87 parity)."""

    def __init__(self, num_requests: int, concurrency: int):
        self._num_requests = num_requests
        self._concurrency = concurrency
        self._done = 0
        self._active = 0
        self._errors = 0
        self._latencies: List[float] = []
        self._cv = threading.Condition()

    def throttle(self):
        with self._cv:
            while self._active >= self._concurrency:
                self._cv.wait()
            self._active += 1

    def record(self, latency: float, error: bool):
        with self._cv:
            self._active -= 1
            self._done += 1
            self._errors += int(error)
            self._latencies.append(latency)
            self._cv.notify()

    def wait_all(self):
        with self._cv:
            while self._done < self._num_requests:
                self._cv.wait()

    def stats(self) -> Dict[str, float]:
        lat = sorted(self._latencies)
        n = len(lat)
        return {
            "requests": n,
            "errors": self._errors,
            "p50_ms": lat[n // 2] * 1e3 if n else 0.0,
            "p99_ms": lat[min(int(n * 0.99), n - 1)] * 1e3 if n else 0.0,
            "mean_ms": sum(lat) / n * 1e3 if n else 0.0,
        }


def do_inference(client: PredictorClient, rows: List[str],
                 num_requests: int, concurrency: int,
                 rows_per_request: int = 1) -> Dict[str, float]:
    """Fire num_requests predictions with bounded concurrency; returns
    latency stats + throughput."""
    counter = _ResultCounter(num_requests, concurrency)
    t_start = time.time()

    def one(i: int):
        start = i * rows_per_request % max(len(rows) - rows_per_request, 1)
        chunk = rows[start:start + rows_per_request]
        t0 = time.time()
        err = False
        try:
            client.predict(chunk)
        except Exception:  # noqa: BLE001
            err = True
        counter.record(time.time() - t0, err)

    for i in range(num_requests):
        counter.throttle()
        threading.Thread(target=one, args=(i,), daemon=True).start()
    counter.wait_all()
    stats = counter.stats()
    wall = time.time() - t_start
    stats["rows_per_s"] = num_requests * rows_per_request / wall
    return stats
