"""Streaming ingestion: train/score on a live TSV stream.

The reference trained from HDFS file drops only; production CTR systems
typically also consume a message stream.  This module provides the
Kafka-style path without external dependencies: a newline-delimited TSV
stream over TCP feeds the same FeatureTransformer as the file pipeline, so
a model can train continuously on live events (Trainer.train_stream) or an
operator can replay a file through tools/stream_server.py to smoke-test the
path end to end.

Semantics:
* rows are consumed in arrival order (no shuffle — streams are already
  time-ordered; match the reference's dynamic_train rolling-window spirit);
* batches are emitted every ``batch_size`` rows, or after
  ``flush_timeout_s`` of idleness with whatever has arrived (padded +
  masked, same as uneven file tails);
* by default a closed connection ends the stream (StopIteration);
  with ``reconnect=True`` the dataset instead retries with exponential
  backoff — a transient producer drop no longer ends a training run, and
  the stream ends only after ``max_retries`` consecutive failed connects
  (a checkpoint-cadenced Trainer.train_stream then resumes where the
  optimizer left off on the next launch);
* multi-host: each process consumes its own stream (the producer shards) —
  round-robin sharding across a shared stream cannot be consistent without
  a broker, so it is explicitly not faked here.
"""

from __future__ import annotations

import socket
from typing import Iterator, Optional

from wide_deep_tpu.features.pipeline import Batch, default_transformer
from wide_deep_tpu.features.plan import FeaturePlan


class StreamDataset:
    """TCP newline-TSV stream -> packed Batch iterator (one-shot)."""

    def __init__(self, plan: FeaturePlan, host: str, port: int,
                 mode: str = "train", batch_size: int = 1024,
                 n_classes: int = 2,
                 pos_weight: Optional[float] = None,
                 neg_weight: Optional[float] = None,
                 flush_timeout_s: float = 1.0,
                 max_batches: Optional[int] = None,
                 transformer=None,
                 connect_timeout_s: float = 10.0,
                 reconnect: bool = False,
                 max_retries: int = 30,
                 backoff_s: float = 0.5,
                 backoff_max_s: float = 30.0):
        if mode not in ("train", "eval", "pred"):
            raise ValueError(f"bad mode {mode}")
        self.plan = plan
        self.mode = mode
        self.batch_size = batch_size
        self.flush_timeout_s = flush_timeout_s
        self.max_batches = max_batches
        self.host, self.port = host, port
        self.connect_timeout_s = connect_timeout_s
        self.reconnect = bool(reconnect)
        self.max_retries = int(max_retries)
        self.backoff_s = float(backoff_s)
        self.backoff_max_s = float(backoff_max_s)
        self.transformer = transformer or default_transformer(
            plan, n_classes, pos_weight, neg_weight)
        self._native = hasattr(self.transformer, "transform_text")
        self.rows_seen = 0
        self.reconnects = 0  # instrumentation (tests/ops)

    def _read_one_connection(self) -> Iterator[str]:
        """Lines from one connection; returns on close/reset."""
        sock = socket.create_connection((self.host, self.port),
                                        timeout=self.connect_timeout_s)
        sock.settimeout(self.flush_timeout_s)
        buf = b""
        clean_close = False
        try:
            while True:
                try:
                    chunk = sock.recv(1 << 16)
                except socket.timeout:
                    yield None  # idle tick -> flush signal
                    continue
                except OSError:
                    break  # reset mid-stream — buffered TAIL is partial
                if not chunk:
                    clean_close = True
                    break
                buf += chunk
                while True:
                    nl = buf.find(b"\n")
                    if nl < 0:
                        break
                    line = buf[:nl].decode("utf-8", errors="replace")
                    buf = buf[nl + 1:]
                    if line.strip():
                        yield line
            # only a CLEAN close may flush an unterminated tail (a
            # producer that wrote its last row without "\n"); after a
            # mid-line reset the tail is a TRUNCATED row — yielding it
            # would train on a corrupted example whenever the cut lands
            # inside the final cell
            if clean_close:
                tail = buf.decode("utf-8", errors="replace")
                if tail.strip():
                    yield tail
            elif buf.strip():
                import logging
                logging.getLogger("wide_deep_tpu.stream").warning(
                    "discarding %d bytes of mid-line partial row after "
                    "connection reset", len(buf))
        finally:
            sock.close()

    def _lines(self) -> Iterator[str]:
        import logging
        import time
        log = logging.getLogger("wide_deep_tpu.stream")
        failures = 0
        while True:
            got_data = False
            try:
                for line in self._read_one_connection():
                    if line is not None:
                        got_data = True
                        failures = 0
                    yield line
            except OSError as e:
                if not self.reconnect:
                    raise
                log.warning("stream connect to %s:%d failed: %s",
                            self.host, self.port, e)
            if not self.reconnect:
                return
            if not got_data:
                failures += 1
                if failures > self.max_retries:
                    log.warning("stream ended: %d consecutive failed "
                                "connects to %s:%d", failures - 1,
                                self.host, self.port)
                    return
            yield None  # flush whatever is buffered before waiting
            self.reconnects += 1
            delay = min(self.backoff_s * (2 ** max(failures - 1, 0)),
                        self.backoff_max_s)
            time.sleep(delay)

    def _emit(self, chunk) -> Batch:
        if self._native:
            text = "\n".join(chunk).encode("utf-8", errors="replace")
            return self.transformer.transform_text(
                text, len(chunk), self.batch_size, self.mode)
        # arity filter like CsvDataset._rows: the native parser drops
        # short/long rows itself, but the Python transformer indexes by
        # schema position — a truncated junk line would IndexError and
        # kill the whole continuous run instead of being skipped
        expect = len(self.plan.columns)
        rows = [cells for line in chunk
                if len(cells := line.split("\t")) == expect]
        if not rows:
            rows = [[""] * expect]  # all-masked placeholder batch
            batch = self.transformer.transform(rows, self.batch_size,
                                               self.mode)
            batch["mask"] = batch["mask"] * 0.0
            batch["weight"] = batch["weight"] * 0.0
            return batch
        return self.transformer.transform(rows, self.batch_size, self.mode)

    def __iter__(self) -> Iterator[Batch]:
        chunk = []
        emitted = 0
        for line in self._lines():
            if line is None:  # idle flush
                if chunk:
                    yield self._emit(chunk)
                    emitted += 1
                    chunk = []
                    if self.max_batches and emitted >= self.max_batches:
                        return
                continue
            chunk.append(line)
            self.rows_seen += 1
            if len(chunk) == self.batch_size:
                yield self._emit(chunk)
                emitted += 1
                chunk = []
                if self.max_batches and emitted >= self.max_batches:
                    return
        if chunk:
            yield self._emit(chunk)


def serve_file(path: str, host: str = "127.0.0.1", port: int = 0,
               rows_per_s: Optional[float] = None, loop: bool = False):
    """Replay a TSV file as a line stream (test/demo producer).

    Returns (server_socket, thread); the bound port is
    ``server_socket.getsockname()[1]``.  One client per call.
    """
    import threading
    import time

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(1)

    def run():
        try:
            conn, _ = srv.accept()
        except OSError:
            return
        try:
            with conn:
                while True:
                    with open(path, "rb") as f:
                        for line in f:
                            conn.sendall(line)
                            if rows_per_s:
                                time.sleep(1.0 / rows_per_s)
                    if not loop:
                        break
        except (BrokenPipeError, ConnectionResetError, OSError):
            pass
        finally:
            srv.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return srv, t
