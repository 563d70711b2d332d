"""Streaming ingestion (features/stream.py): TCP TSV stream -> training."""

import numpy as np
import pytest

from paths import UNIT_FIXTURE as FIXTURE


class TestStreamDataset:
    def test_stream_matches_file_batches(self, small_plan):
        """Replaying a file through TCP must produce the same eval batches
        as reading it directly (arrival order, no shuffle)."""
        from wide_deep_tpu.features.pipeline import CsvDataset
        from wide_deep_tpu.features.stream import StreamDataset, serve_file

        srv, _ = serve_file(FIXTURE)
        port = srv.getsockname()[1]
        stream = list(StreamDataset(small_plan, "127.0.0.1", port,
                                    mode="eval", batch_size=4,
                                    flush_timeout_s=0.3))
        direct = list(CsvDataset(small_plan, FIXTURE, "eval", 4))
        assert len(stream) == len(direct)
        for sb, db in zip(stream, direct):
            assert set(sb) == set(db)
            for k in sb:
                np.testing.assert_array_equal(sb[k], db[k], err_msg=k)

    def test_idle_flush_emits_partial_batch(self, small_plan):
        """A trickling producer must not stall the consumer: idle timeout
        flushes whatever arrived, padded + masked."""
        import threading
        import time
        import socket as socket_mod

        from wide_deep_tpu.features.stream import StreamDataset

        srv = socket_mod.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]
        with open(FIXTURE) as f:
            rows = [line for line in f if line.strip()][:3]

        def producer():
            conn, _ = srv.accept()
            with conn:
                conn.sendall("".join(rows[:2]).encode())
                time.sleep(1.0)  # > flush_timeout: first batch must flush
                conn.sendall(rows[2].encode())
                time.sleep(0.2)
            srv.close()

        threading.Thread(target=producer, daemon=True).start()
        ds = StreamDataset(small_plan, "127.0.0.1", port, mode="eval",
                           batch_size=8, flush_timeout_s=0.3)
        batches = list(ds)
        assert len(batches) >= 2
        assert batches[0]["mask"].sum() == 2  # idle-flushed partial batch
        assert sum(int(b["mask"].sum()) for b in batches) == 3

    def test_trainer_train_stream(self, small_config, tmp_path):
        """End-to-end: Trainer.train_stream consumes a replayed stream and
        advances the step/loss."""
        from wide_deep_tpu.features.stream import serve_file
        from wide_deep_tpu.training.loop import Trainer

        srv, _ = serve_file(FIXTURE, loop=True)
        port = srv.getsockname()[1]
        tr = Trainer(small_config, model_type="wide_deep",
                     model_dir=str(tmp_path / "m"),
                     overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                                    test_data=FIXTURE, keep_train=True,
                                    batch_size=8))
        tr.ensure_initialized(restore=False)
        loss = tr.train_stream("127.0.0.1", port, max_batches=3)
        assert np.isfinite(loss)
        assert tr.global_step == 3
        srv.close()


class TestReconnect:
    def test_survives_producer_restart(self, small_plan):
        """A producer drop mid-run must not end the stream when
        reconnect=True: the dataset backs off, reconnects to the restarted
        producer, and consumes both runs' rows."""
        import socket

        from wide_deep_tpu.features.stream import StreamDataset, serve_file

        srv1, _ = serve_file(FIXTURE)
        port = srv1.getsockname()[1]
        ds = StreamDataset(small_plan, "127.0.0.1", port, batch_size=4,
                           flush_timeout_s=0.2, reconnect=True,
                           max_retries=8, backoff_s=0.05, backoff_max_s=0.2)
        rows = 0
        restarted = False
        for batch in ds:
            rows += int(batch["mask"].sum())
            if rows >= 10 and not restarted:
                # first producer is done (file fully sent + closed);
                # restart one on the same port while the consumer retries
                restarted = True
                srv2, _ = serve_file(FIXTURE, port=port)
        assert restarted
        assert rows == 20  # both producer runs fully consumed
        assert ds.reconnects >= 1

    def test_no_reconnect_default_ends_on_close(self, small_plan):
        from wide_deep_tpu.features.stream import StreamDataset, serve_file

        srv, _ = serve_file(FIXTURE)
        port = srv.getsockname()[1]
        ds = StreamDataset(small_plan, "127.0.0.1", port, batch_size=4,
                           flush_timeout_s=0.2)
        rows = sum(int(b["mask"].sum()) for b in ds)
        assert rows == 10

    def test_retries_exhausted_ends_stream(self, small_plan):
        import socket

        from wide_deep_tpu.features.stream import StreamDataset

        # reserve a port nothing listens on
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        ds = StreamDataset(small_plan, "127.0.0.1", port, batch_size=4,
                           reconnect=True, max_retries=2, backoff_s=0.01,
                           connect_timeout_s=0.2)
        assert list(ds) == []
        assert ds.rows_seen == 0


class TestJunkTolerance:
    def test_midline_reset_discards_partial_tail(self, small_plan):
        """A connection RESET halfway through a row must discard the
        buffered prefix — flushing it as a 'row' would train on a
        truncated example whenever the cut lands inside the last cell
        (review round 5).  A clean close still flushes an unterminated
        final row."""
        import socket
        import struct
        import threading

        from wide_deep_tpu.features.stream import StreamDataset
        with open(FIXTURE) as f:
            lines = [l.rstrip("\n") for l in f if l.strip()]

        srv = socket.socket()
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]

        def producer():
            conn, _ = srv.accept()
            # two full rows, then HALF a row, then a hard reset (RST via
            # SO_LINGER 0) so the consumer sees an OSError mid-line
            conn.sendall((lines[0] + "\n" + lines[1] + "\n").encode())
            conn.sendall(lines[2][:20].encode())
            import time
            time.sleep(0.3)
            conn.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                            struct.pack("ii", 1, 0))
            conn.close()

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        ds = StreamDataset(small_plan, "127.0.0.1", port, batch_size=4,
                           flush_timeout_s=0.2)
        total = sum(int(b["mask"].sum()) for b in ds)
        srv.close()
        # exactly the two complete rows; the truncated third is discarded
        assert total == 2

    def test_python_path_skips_short_rows(self, small_plan):
        """With the pure-Python transformer a truncated junk line must be
        skipped, not IndexError the whole continuous run (the native
        parser already drops such lines itself)."""
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        from wide_deep_tpu.features.stream import StreamDataset, serve_file

        srv, _ = serve_file(FIXTURE)
        port = srv.getsockname()[1]
        ds = StreamDataset(
            small_plan, "127.0.0.1", port, batch_size=4,
            flush_timeout_s=0.2,
            transformer=FeatureTransformer(small_plan))
        # inject junk through the emit path directly as well: a chunk of
        # only-junk lines must yield an all-masked batch, not crash
        junk_batch = ds._emit(["short\trow", "x"])
        assert int(np.asarray(junk_batch["mask"]).sum()) == 0
        mixed = ds._emit(["a\tb\tc"])  # wrong arity -> masked
        assert int(np.asarray(mixed["mask"]).sum()) == 0
        rows = sum(int(b["mask"].sum()) for b in ds)
        assert rows == 10
