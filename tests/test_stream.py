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
