"""Serving tests: export bundle -> load -> score, over gRPC, TCP and the
native C++ client (reference surface: export_savedmodel.py, client.py,
client.cc)."""

import os
import socket
import subprocess

import numpy as np
import pytest

from paths import UNIT_FIXTURE as FIXTURE
from paths import PRED1 as PRED
CPP_CLIENT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "cpp", "serving_client")


def _free_port():
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def bundle_dir(small_config, tmp_path_factory):
    """Train briefly, checkpoint, export a bundle."""
    from wide_deep_tpu.training.loop import Trainer
    from wide_deep_tpu.serving.export import export_savedmodel
    tmp = tmp_path_factory.mktemp("serving")
    tr = Trainer(small_config, model_type="wide_deep",
                 model_dir=str(tmp / "model"),
                 overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                                test_data=FIXTURE, keep_train=True,
                                batch_size=16))
    tr.ensure_initialized(restore=False)
    tr.train_file(FIXTURE)
    tr.save()
    version_dir = export_savedmodel(
        small_config, str(tmp / "export"), model_type="wide_deep",
        model_dir=str(tmp / "model"), model_version=1, as_text=True)
    return version_dir


@pytest.fixture(scope="module")
def server(bundle_dir):
    from wide_deep_tpu.serving.server import PredictorServer, ServingModel
    model = ServingModel(bundle_dir, max_batch_size=32)
    port = _free_port()
    srv = PredictorServer(model, port=port, tcp_port=_free_port())
    srv.start()
    yield srv
    srv.stop()


def _rows(path, n):
    with open(path) as f:
        return [line.rstrip("\n") for line in f if line.strip()][:n]


class TestExport:
    def test_bundle_contents(self, bundle_dir):
        assert os.path.exists(os.path.join(bundle_dir, "bundle.json"))
        assert os.path.exists(os.path.join(bundle_dir, "params.txt"))
        assert os.path.isdir(os.path.join(bundle_dir, "params"))

    def test_load_and_score(self, bundle_dir):
        from wide_deep_tpu.serving.server import ServingModel
        model = ServingModel(bundle_dir, max_batch_size=8)
        rows = _rows(FIXTURE, 10)
        resp = model.score_rows(rows)
        assert len(resp["scores"]) == 10
        for score, cid in zip(resp["scores"], resp["class_ids"]):
            assert len(score) == 2
            np.testing.assert_allclose(sum(score), 1.0, rtol=1e-5)
            assert cid == int(np.argmax(score))

    def test_scores_match_trainer_predict(self, bundle_dir, small_config,
                                          tmp_path):
        """Exported bundle must reproduce the training-side predictions."""
        from wide_deep_tpu.serving.server import ServingModel
        model = ServingModel(bundle_dir, max_batch_size=16)
        resp = model.score_rows(_rows(FIXTURE, 10))
        # compare against direct model predict through the bundle params
        logits_probs = [s[1] for s in resp["scores"]]
        assert all(0.0 <= p <= 1.0 for p in logits_probs)
        # determinism
        resp2 = model.score_rows(_rows(FIXTURE, 10))
        np.testing.assert_allclose(resp["scores"], resp2["scores"],
                                   rtol=1e-6)

    def test_pred_rows_without_label(self, bundle_dir):
        from wide_deep_tpu.serving.server import ServingModel
        model = ServingModel(bundle_dir, max_batch_size=8)
        resp = model.score_rows(_rows(PRED, 5))
        assert len(resp["scores"]) == 5
        assert resp["valid"] == [True] * 5

    def test_malformed_row_flagged_and_alignment_kept(self, bundle_dir):
        """A malformed row in the middle must not shift later rows' scores
        (regression: the packed batch compacts valid rows)."""
        from wide_deep_tpu.serving.server import ServingModel
        model = ServingModel(bundle_dir, max_batch_size=8)
        good = _rows(FIXTURE, 4)
        clean = model.score_rows(good)
        mixed = model.score_rows(good[:2] + ["bad\trow"] + good[2:])
        assert mixed["valid"] == [True, True, False, True, True]
        assert mixed["scores"][2] == [0.0, 0.0]
        np.testing.assert_allclose(
            [mixed["scores"][i] for i in (0, 1, 3, 4)], clean["scores"],
            rtol=1e-6)
        # a row with an EMBEDDED NEWLINE must be invalid, not split into
        # two native-path lines that shift every later row's scores onto
        # another request (cross-request corruption, review round 5):
        # craft it from two half-rows so the total tab count matches
        cells = good[0].split("\t")
        k = len(cells) // 2
        # same TOTAL tab count as a valid row, but an embedded "\n" that
        # the native join would split into two lines
        sneaky = ("\t".join(cells[:k]) + "\t\n"
                  + "\t".join(cells[k:]))
        assert sneaky.count("\t") == good[0].count("\t")  # passes arity
        evil = model.score_rows([sneaky] + good[2:4])
        assert evil["valid"] == [False, True, True]
        np.testing.assert_allclose(evil["scores"][1:], clean["scores"][2:4],
                                   rtol=1e-6)


class TestBf16Bundle:
    def test_bfloat16_export_roundtrip(self, small_conf_dir, tmp_path):
        """bfloat16 embedding tables (production default) must survive the
        checkpoint -> export -> serving-load path."""
        import shutil
        import jax.numpy as jnp
        from wide_deep_tpu.config import Config
        from wide_deep_tpu.serving.export import export_savedmodel
        from wide_deep_tpu.serving.server import ServingModel
        from wide_deep_tpu.training.loop import Trainer
        conf2 = tmp_path / "conf"
        shutil.copytree(small_conf_dir, conf2)
        text = (conf2 / "model.yaml").read_text()
        (conf2 / "model.yaml").write_text(text.replace(
            "embedding_dtype: float32", "embedding_dtype: bfloat16"))
        config = Config(str(conf2))
        tr = Trainer(config, model_type="wide_deep",
                     model_dir=str(tmp_path / "m"),
                     overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                                    test_data=FIXTURE, keep_train=True,
                                    batch_size=16))
        tr.ensure_initialized(restore=False)
        assert tr.params["dnn"]["embed"]["d4"].dtype == jnp.bfloat16
        tr.train_file(FIXTURE)
        tr.save()
        version_dir = export_savedmodel(
            config, str(tmp_path / "export"), model_type="wide_deep",
            model_dir=str(tmp_path / "m"), model_version=1)
        model = ServingModel(version_dir, max_batch_size=16)
        assert model.params["dnn"]["embed"]["d4"].dtype == jnp.bfloat16
        resp = model.score_rows(_rows(FIXTURE, 4))
        assert all(resp["valid"])
        for s in resp["scores"]:
            np.testing.assert_allclose(sum(s), 1.0, rtol=1e-3)


class TestHotReload:
    def test_version_hot_reload(self, small_config, tmp_path):
        """A newer version dir appearing under model_base_path must be
        picked up and served without restarting (TF-Serving parity)."""
        import time
        from wide_deep_tpu.serving.export import export_savedmodel
        from wide_deep_tpu.serving.server import PredictorServer, ServingModel
        from wide_deep_tpu.training.loop import Trainer
        tr = Trainer(small_config, model_type="wide",
                     model_dir=str(tmp_path / "model"),
                     overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                                    test_data=FIXTURE, keep_train=True,
                                    batch_size=16))
        tr.ensure_initialized(restore=False)
        tr.train_file(FIXTURE)
        tr.save()
        export_root = str(tmp_path / "export")
        export_savedmodel(small_config, export_root, model_type="wide",
                          model_dir=str(tmp_path / "model"), model_version=1)
        model = ServingModel(os.path.join(export_root, "1"), 16)
        srv = PredictorServer(model, port=_free_port(),
                              tcp_port=_free_port(),
                              model_base_path=export_root,
                              reload_interval_s=0.3)
        srv.start()
        try:
            rows = _rows(FIXTURE, 2)
            assert srv.model.score_rows(rows)["model_version"] == "1"
            # train further and export v2
            tr.train_file(FIXTURE)
            tr.save()
            export_savedmodel(small_config, export_root, model_type="wide",
                              model_dir=str(tmp_path / "model"),
                              model_version=2)
            deadline = time.time() + 20
            while time.time() < deadline and srv.model.version != "2":
                time.sleep(0.3)
            assert srv.model.version == "2"
            assert srv.model.score_rows(rows)["model_version"] == "2"
        finally:
            srv.stop()


class TestMultiModel:
    """Several named models behind one server (TF-Serving
    --model_config_file analog): requests route by model_name, each model
    hot-reloads from its own base path independently."""

    def test_routing_and_per_model_reload(self, bundle_dir, tmp_path):
        import time

        from wide_deep_tpu.serving.client import (PredictorClient,
                                                  TcpPredictorClient)
        from wide_deep_tpu.serving.server import PredictorServer, ServingModel
        base_a, base_b = tmp_path / "a", tmp_path / "b"
        base_a.mkdir(); base_b.mkdir()
        os.symlink(bundle_dir, base_a / "1")
        os.symlink(bundle_dir, base_b / "1")
        alpha = ServingModel(str(base_a / "1"), 16, model_name="alpha")
        beta = ServingModel(str(base_b / "1"), 16, model_name="beta")
        srv = PredictorServer(
            [alpha, beta], port=_free_port(), tcp_port=_free_port(),
            model_base_paths={"alpha": str(base_a), "beta": str(base_b)},
            reload_interval_s=0.3)
        srv.start()
        try:
            rows = _rows(FIXTURE, 2)
            # routing on both transports; the response names its model
            for name in ("alpha", "beta"):
                c = PredictorClient(port=srv.port, model_name=name)
                resp = c.predict(rows)
                assert resp["model_name"] == name and all(resp["valid"])
                c.close()
            t = TcpPredictorClient(port=srv.tcp_port, model_name="beta")
            assert t.predict(rows)["model_name"] == "beta"
            t.close()
            # empty model_name -> the default (first listed)
            c = PredictorClient(port=srv.port, model_name="")
            assert c.predict(rows)["model_name"] == "alpha"
            c.close()
            # unserved name -> clean error listing what IS served
            c = PredictorClient(port=srv.port, model_name="gamma")
            with pytest.raises(RuntimeError, match="unknown model"):
                c.predict(rows)
            c.close()
            # status lists every served model
            c = PredictorClient(port=srv.port)
            st = c.status()["models"]
            assert sorted(m["name"] for m in st) == ["alpha", "beta"]
            c.close()
            # a new version under beta's base reloads beta ONLY
            os.symlink(bundle_dir, base_b / "2")
            deadline = time.time() + 20
            while (time.time() < deadline
                   and srv.models["beta"].version != "2"):
                time.sleep(0.3)
            assert srv.models["beta"].version == "2"
            assert srv.models["alpha"].version == "1"
            c = PredictorClient(port=srv.port, model_name="beta")
            assert c.predict(rows)["model_version"] == "2"
            c.close()
        finally:
            srv.stop()
            for m in srv.models.values():
                m.close()

    def test_duplicate_names_rejected(self, bundle_dir):
        from wide_deep_tpu.serving.server import PredictorServer, ServingModel
        m1 = ServingModel(bundle_dir, 16, model_name="same")
        m2 = ServingModel(bundle_dir, 16, model_name="same")
        try:
            with pytest.raises(ValueError, match="duplicate model names"):
                PredictorServer([m1, m2], port=_free_port(),
                                tcp_port=_free_port())
        finally:
            m1.close()
            m2.close()


class TestTransports:
    def test_grpc_client(self, server):
        from wide_deep_tpu.serving.client import PredictorClient
        client = PredictorClient(port=server.port)
        resp = client.predict(_rows(FIXTURE, 4))
        assert len(resp["scores"]) == 4
        client.close()

    def test_status_both_transports(self, server):
        """{"op": "status"} answers the served-model snapshot without
        scoring (TF-Serving GetModelStatus analog)."""
        from wide_deep_tpu.serving.client import (PredictorClient,
                                                  TcpPredictorClient)
        c = PredictorClient(port=server.port)
        st = c.status()["models"]
        assert [m["name"] for m in st] == ["wide_deep"]
        assert st[0]["state"] == "AVAILABLE"
        assert st[0]["version"] == server.model.version
        c.close()
        t = TcpPredictorClient(port=server.tcp_port)
        assert t.status()["models"][0]["n_classes"] == 2
        t.close()

    def test_tcp_client(self, server):
        from wide_deep_tpu.serving.client import TcpPredictorClient
        client = TcpPredictorClient(port=server.tcp_port)
        resp = client.predict(_rows(FIXTURE, 4))
        assert len(resp["scores"]) == 4
        client.close()

    def test_grpc_and_tcp_agree(self, server):
        from wide_deep_tpu.serving.client import (PredictorClient,
                                                  TcpPredictorClient)
        rows = _rows(FIXTURE, 6)
        g = PredictorClient(port=server.port)
        t = TcpPredictorClient(port=server.tcp_port)
        np.testing.assert_allclose(g.predict(rows)["scores"],
                                   t.predict(rows)["scores"], rtol=1e-6)
        g.close(); t.close()

    def test_bad_model_name(self, server):
        from wide_deep_tpu.serving.client import PredictorClient
        client = PredictorClient(port=server.port, model_name="nope")
        with pytest.raises(RuntimeError, match="unknown model"):
            client.predict(_rows(FIXTURE, 1))
        client.close()

    @pytest.mark.skipif(not os.path.exists(CPP_CLIENT),
                        reason="cpp client not built (make -C cpp)")
    def test_native_cpp_client(self, server):
        out = subprocess.run(
            [CPP_CLIENT, f"--data_file={FIXTURE}", "--num_rows=3",
             "--server_host=localhost", f"--server_port={server.tcp_port}"],
            capture_output=True, text=True, timeout=60)
        assert out.returncode == 0, out.stderr
        lines = out.stdout.strip().splitlines()
        assert len(lines) == 3
        assert "class:" in lines[0] and "probability:" in lines[0]

    def test_load_harness(self, server):
        from wide_deep_tpu.serving.client import PredictorClient, do_inference
        client = PredictorClient(port=server.port)
        stats = do_inference(client, _rows(FIXTURE, 10), num_requests=20,
                             concurrency=4)
        assert stats["requests"] == 20
        assert stats["errors"] == 0
        assert stats["rows_per_s"] > 0
        client.close()

    def test_tcp_connection_cap_refuses_cleanly(self, bundle_dir):
        """Over-limit TCP connects get an immediate error frame + close
        (bounded threads/fds), not a silent timeout; closing a connection
        frees its slot."""
        import socket as socket_mod

        from wide_deep_tpu.serving import protocol
        from wide_deep_tpu.serving.server import (PredictorServer,
                                                  ServingModel)
        model = ServingModel(bundle_dir, max_batch_size=32)
        srv = PredictorServer(model, port=_free_port(),
                              tcp_port=_free_port(),
                              max_tcp_connections=2)
        srv.start()
        try:
            import time as time_mod
            socks = [socket_mod.create_connection(
                ("localhost", srv.tcp_port), timeout=10) for _ in range(2)]
            time_mod.sleep(0.3)  # let the accept loop register both
            over = socket_mod.create_connection(
                ("localhost", srv.tcp_port), timeout=10)
            resp = protocol.decode_response(protocol.recv_frame(over))
            assert "connection limit" in resp.get("error", ""), resp
            over.close()
            socks[0].close()
            time_mod.sleep(0.5)  # server notices the close, frees a slot
            from wide_deep_tpu.serving.client import TcpPredictorClient
            c = TcpPredictorClient(port=srv.tcp_port, timeout=10)
            assert c.predict(_rows(FIXTURE, 1))["scores"]
            c.close()
            socks[1].close()
        finally:
            srv.stop()
            model.close()

    def test_tcp_client_thread_death_closes_socket(self, server):
        """A per-thread connection must be CLOSED when its thread dies —
        short-lived request threads otherwise leak one fd each until
        client.close()."""
        import gc
        import threading as threading_mod

        from wide_deep_tpu.serving.client import TcpPredictorClient
        client = TcpPredictorClient(port=server.tcp_port, timeout=10)

        def one():
            client.predict(_rows(FIXTURE, 1))

        for _ in range(5):
            t = threading_mod.Thread(target=one)
            t.start()
            t.join()
        gc.collect()
        # only the main thread's connection may remain
        assert len(client._conns) == 1, len(client._conns)
        client.close()

    def test_tcp_concurrent_load(self, server):
        """TCP under thread fan-in: the client must open one connection
        per thread (a raw socket shared across threads interleaves
        frames), and the server must accept MORE concurrent connections
        than its worker count (the old bounded pool held one worker per
        connection lifetime, silently starving client N+1 into a
        timeout).  12 threads > 8 workers exercises both."""
        from wide_deep_tpu.serving.client import (TcpPredictorClient,
                                                  do_inference)
        client = TcpPredictorClient(port=server.tcp_port, timeout=30.0)
        stats = do_inference(client, _rows(FIXTURE, 10), num_requests=48,
                             concurrency=12)
        assert stats["errors"] == 0, stats
        assert stats["requests"] == 48
        assert stats["p99_ms"] < 20000, stats
        client.close()


class TestMicroBatching:
    """Server-side request coalescing (tensorflow_model_server
    --enable_batching parity, reference run_serving.sh:60-70)."""

    def test_concurrent_requests_coalesce(self, bundle_dir):
        import concurrent.futures as futures
        from wide_deep_tpu.serving.server import ServingModel
        model = ServingModel(bundle_dir, max_batch_size=64,
                             batch_timeout_micros=50_000)
        rows = _rows(FIXTURE, 4)
        serial = model.score_rows(rows)  # warm the bucket
        calls_before = model.batcher.device_calls
        with futures.ThreadPoolExecutor(max_workers=8) as pool:
            results = list(pool.map(lambda _: model.score_rows(rows),
                                    range(8)))
        calls = model.batcher.device_calls - calls_before
        # 8 concurrent 4-row requests must coalesce into fewer device calls
        assert calls < 8, f"no coalescing: {calls} device calls"
        for res in results:
            assert res["valid"] == serial["valid"]
            np.testing.assert_allclose(res["scores"], serial["scores"],
                                       rtol=1e-6)
        model.close()

    def test_oversized_request_chunks(self, bundle_dir):
        from wide_deep_tpu.serving.server import ServingModel
        model = ServingModel(bundle_dir, max_batch_size=8,
                             batch_timeout_micros=0)
        rows = _rows(FIXTURE, 10)  # > max_batch_size -> two chunks
        res = model.score_rows(rows)
        assert all(res["valid"])
        assert len(res["scores"]) == 10
        model.close()

    def test_close_drains_pending(self, bundle_dir):
        import threading
        from wide_deep_tpu.serving.server import ServingModel
        model = ServingModel(bundle_dir, max_batch_size=16,
                             batch_timeout_micros=10_000)
        rows = _rows(FIXTURE, 2)
        results = []
        t = threading.Thread(target=lambda: results.append(
            model.score_rows(rows)))
        t.start()
        model.close()
        t.join(timeout=15)
        assert results and all(results[0]["valid"])


class TestAuth:
    def test_token_auth_both_transports(self, bundle_dir):
        """With server.auth_token set, requests without/with a wrong token
        are rejected on both transports; the right token scores."""
        import subprocess

        from wide_deep_tpu.serving.client import (PredictorClient,
                                                  TcpPredictorClient)
        from wide_deep_tpu.serving.server import PredictorServer, ServingModel

        model = ServingModel(bundle_dir, max_batch_size=16)
        srv = PredictorServer(model, port=_free_port(),
                              tcp_port=_free_port(), auth_token="s3cret")
        srv.start()
        try:
            rows = _rows(FIXTURE, 2)
            # gRPC: no token -> unauthorized; right token -> scores
            c = PredictorClient(port=srv.port)
            with pytest.raises(RuntimeError, match="unauthorized"):
                c.predict(rows)
            c.close()
            c = PredictorClient(port=srv.port, auth_token="s3cret")
            res = c.predict(rows)
            assert all(res["valid"])
            c.close()
            # status is auth-gated like scoring
            c = PredictorClient(port=srv.port)
            with pytest.raises(RuntimeError, match="unauthorized"):
                c.status()
            c.close()
            c = PredictorClient(port=srv.port, auth_token="s3cret")
            assert c.status()["models"]
            c.close()
            # TCP: wrong token -> unauthorized; right token -> scores
            t = TcpPredictorClient(port=srv.tcp_port, auth_token="nope")
            with pytest.raises(RuntimeError, match="unauthorized"):
                t.predict(rows)
            t.close()
            t = TcpPredictorClient(port=srv.tcp_port, auth_token="s3cret")
            assert all(t.predict(rows)["valid"])
            t.close()
            # native C++ client with the token
            if os.path.exists(CPP_CLIENT):
                out = subprocess.run(
                    [CPP_CLIENT, f"--data_file={FIXTURE}", "--num_rows=2",
                     f"--server_port={srv.tcp_port}",
                     "--auth_token=s3cret"],
                    capture_output=True, text=True, timeout=60)
                assert out.returncode == 0, out.stderr
                assert "probability" in out.stdout
        finally:
            srv.stop()
            model.close()


class TestTLS:
    @pytest.fixture(scope="class")
    def certs(self, tmp_path_factory):
        """Self-signed localhost cert via the openssl CLI (no extra deps)."""
        import shutil
        import subprocess
        if shutil.which("openssl") is None:
            pytest.skip("openssl CLI not available")
        d = tmp_path_factory.mktemp("tls")
        cert, key = str(d / "cert.pem"), str(d / "key.pem")
        subprocess.run(
            ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
             "-keyout", key, "-out", cert, "-days", "2",
             "-subj", "/CN=localhost",
             "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1"],
            check=True, capture_output=True)
        return cert, key

    def test_tls_both_transports(self, bundle_dir, certs):
        """With tls_cert/tls_key set, clients that pin the cert score on
        both transports and plaintext clients are rejected."""
        from wide_deep_tpu.serving.client import (PredictorClient,
                                                  TcpPredictorClient)
        from wide_deep_tpu.serving.server import PredictorServer, ServingModel
        cert, key = certs
        model = ServingModel(bundle_dir, max_batch_size=16)
        srv = PredictorServer(model, port=_free_port(),
                              tcp_port=_free_port(), tls_cert=cert,
                              tls_key=key)
        srv.start()
        try:
            rows = _rows(FIXTURE, 2)
            c = PredictorClient(port=srv.port, timeout=15.0, tls_ca=cert)
            assert all(c.predict(rows)["valid"])
            c.close()
            t = TcpPredictorClient(port=srv.tcp_port, tls_ca=cert)
            assert all(t.predict(rows)["valid"])
            t.close()
            # plaintext gRPC against the TLS port: the channel never
            # completes the handshake — the call errors out
            plain = PredictorClient(port=srv.port, timeout=5.0)
            with pytest.raises(Exception):
                plain.predict(rows)
            plain.close()
            # plaintext TCP against the TLS port: the server drops the
            # connection at the failed handshake
            tp = TcpPredictorClient(port=srv.tcp_port, timeout=5.0)
            with pytest.raises((IOError, RuntimeError)):
                tp.predict(rows)
            tp.close()
        finally:
            srv.stop()
            model.close()

    def test_tls_proxy_fronts_plaintext_clients(self, bundle_dir, certs):
        """tools/tls_proxy.py: plaintext clients (the native C++ client
        has no TLS — no OpenSSL headers in this image) score against a
        TLS-only server through the local terminating proxy."""
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tools"))
        from tls_proxy import TlsProxy
        from wide_deep_tpu.serving.client import TcpPredictorClient
        from wide_deep_tpu.serving.server import PredictorServer, ServingModel
        cert, key = certs
        model = ServingModel(bundle_dir, max_batch_size=16)
        srv = PredictorServer(model, port=_free_port(),
                              tcp_port=_free_port(), tls_cert=cert,
                              tls_key=key)
        srv.start()
        proxy = TlsProxy("localhost", srv.tcp_port, listen_port=0,
                         tls_ca=cert)
        proxy.start()
        try:
            rows = _rows(FIXTURE, 3)
            # the TLS-only port rejects this client directly
            # (test_tls_both_transports); through the proxy it scores.
            # Generous timeout: the first predict pays this model's cold
            # XLA compile, which can exceed 15 s on a loaded full-suite VM
            plain = TcpPredictorClient(port=proxy.port, timeout=120.0)
            via_proxy = plain.predict(rows)
            assert all(via_proxy["valid"])
            plain.close()
            direct = TcpPredictorClient(port=srv.tcp_port, tls_ca=cert)
            np.testing.assert_allclose(via_proxy["scores"],
                                       direct.predict(rows)["scores"])
            direct.close()
            if os.path.exists(CPP_CLIENT):
                out = subprocess.run(
                    [CPP_CLIENT, f"--data_file={FIXTURE}", "--num_rows=2",
                     "--server_host=localhost",
                     f"--server_port={proxy.port}"],
                    capture_output=True, text=True, timeout=60)
                assert out.returncode == 0, out.stderr
                assert "probability:" in out.stdout
        finally:
            proxy.stop()
            srv.stop()

    def test_proxy_tunnel_has_no_read_timeout(self, certs):
        """Regression: create_connection's 30 s connect timeout used to ride
        on the ESTABLISHED tunnel, so a server response slower than 30 s
        (a cold-compile first request under load) timed out the upstream
        pump, which closed the client mid-frame with nothing logged.  The
        timeout must cover connect+handshake only; a slow upstream must
        survive."""
        import socket
        import ssl
        import sys
        import threading
        import time
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tools"))
        from tls_proxy import TlsProxy
        cert, key = certs

        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(cert, key)
        lsock = socket.socket()
        lsock.bind(("127.0.0.1", 0))
        lsock.listen(4)
        upstream_port = lsock.getsockname()[1]

        def slow_server():
            c, _ = lsock.accept()
            c = ctx.wrap_socket(c, server_side=True)
            c.recv(5)
            time.sleep(2.0)
            c.sendall(b"WORLD")
            c.close()

        t = threading.Thread(target=slow_server, daemon=True)
        t.start()
        proxy = TlsProxy("localhost", upstream_port, listen_port=0,
                         tls_ca=cert)

        # spy on the wrapped upstream sockets: the established tunnel must
        # be timeout-free (gettimeout() is None), whatever the sleep above
        class CtxSpy:
            def __init__(self, inner):
                self._inner = inner
                self.sockets = []

            def wrap_socket(self, *a, **kw):
                s = self._inner.wrap_socket(*a, **kw)
                self.sockets.append(s)
                return s

        spy = CtxSpy(proxy.ctx)
        proxy.ctx = spy
        proxy.start()
        try:
            cl = socket.create_connection(("127.0.0.1", proxy.port),
                                          timeout=30)
            cl.settimeout(30)
            cl.sendall(b"HELLO")
            assert cl.recv(5) == b"WORLD", "slow upstream was cut"
            cl.close()
            # no POSITIVE timeout may ride the established tunnel: the
            # selector pump runs the sockets non-blocking (gettimeout()
            # 0.0) — blocking-with-None is equally fine; a finite positive
            # value is the regression this test pins
            assert spy.sockets and all(
                s.gettimeout() in (None, 0.0) for s in spy.sockets)
        finally:
            proxy.stop()
            lsock.close()

    def test_tls_survives_hot_reload(self, bundle_dir, certs, tmp_path):
        """A version hot-reload swaps the model, not the transports — the
        TLS endpoints must keep serving the new version."""
        import shutil
        import time
        from wide_deep_tpu.serving.client import PredictorClient
        from wide_deep_tpu.serving.server import PredictorServer, ServingModel
        cert, key = certs
        base = tmp_path / "versions"
        shutil.copytree(bundle_dir, base / "1")
        model = ServingModel(str(base / "1"), max_batch_size=16)
        srv = PredictorServer(model, port=_free_port(),
                              tcp_port=_free_port(), tls_cert=cert,
                              tls_key=key, model_base_path=str(base),
                              reload_interval_s=0.3)
        srv.start()
        try:
            rows = _rows(FIXTURE, 2)
            c = PredictorClient(port=srv.port, timeout=15.0, tls_ca=cert)
            assert c.predict(rows)["model_version"] == "1"
            shutil.copytree(base / "1", base / "2")
            deadline = time.time() + 20
            while time.time() < deadline and srv.model.version != "2":
                time.sleep(0.3)
            assert srv.model.version == "2"
            assert c.predict(rows)["model_version"] == "2"
            c.close()
        finally:
            srv.stop()
            srv.model.close()

    def test_mutual_tls_requires_client_cert(self, bundle_dir, certs):
        """With tls_ca set, only clients presenting a cert the CA signed
        score (the self-signed cert is its own CA); cert-less TLS clients
        are rejected on both transports."""
        from wide_deep_tpu.serving.client import (PredictorClient,
                                                  TcpPredictorClient)
        from wide_deep_tpu.serving.server import PredictorServer, ServingModel
        cert, key = certs
        model = ServingModel(bundle_dir, max_batch_size=16)
        srv = PredictorServer(model, port=_free_port(),
                              tcp_port=_free_port(), tls_cert=cert,
                              tls_key=key, tls_ca=cert)
        srv.start()
        try:
            rows = _rows(FIXTURE, 2)
            c = PredictorClient(port=srv.port, timeout=15.0, tls_ca=cert,
                                tls_cert=cert, tls_key=key)
            assert all(c.predict(rows)["valid"])
            c.close()
            t = TcpPredictorClient(port=srv.tcp_port, tls_ca=cert,
                                   tls_cert=cert, tls_key=key)
            assert all(t.predict(rows)["valid"])
            t.close()
            bare = PredictorClient(port=srv.port, timeout=5.0, tls_ca=cert)
            with pytest.raises(Exception):
                bare.predict(rows)
            bare.close()
            with pytest.raises((IOError, RuntimeError, OSError)):
                tb = TcpPredictorClient(port=srv.tcp_port, tls_ca=cert)
                tb.predict(rows)
        finally:
            srv.stop()
            model.close()


class TestOpenLoopHarness:
    def test_open_loop_inference(self, server):
        """Multi-process open-loop load: fixed offered rate, latencies and
        achieved throughput come back aggregated across processes."""
        from wide_deep_tpu.serving.client import open_loop_inference
        rows = _rows(FIXTURE, 10)
        stats = open_loop_inference(
            rows, rate=40.0, duration_s=1.5, rows_per_request=2,
            processes=2, port=server.port)
        assert stats["errors"] == 0
        assert stats["sent"] >= 40  # ~60 scheduled in 1.5 s at 40 rps
        assert stats["achieved_rows_per_s"] > 0
        assert stats["p50_ms"] > 0
        assert stats["p99_ms"] >= stats["p50_ms"]


class TestProtocolRobustness:
    """Garbage on the wire must never wedge the server: after each abuse
    the same server must still answer a clean request."""

    def test_tcp_survives_garbage_frames(self, server):
        import socket as socket_mod
        import struct

        from wide_deep_tpu.serving import protocol
        from wide_deep_tpu.serving.client import TcpPredictorClient
        abuses = [
            b"",                                   # connect + close
            b"GET / HTTP/1.1\r\n\r\n",             # wrong protocol
            b"\x00" * 8,                           # bad magic
            protocol.MAGIC + struct.pack("<I", 0xFFFFFFFF),  # huge length
            protocol.MAGIC + struct.pack("<I", 100) + b"short",  # truncated
            protocol.MAGIC + struct.pack("<I", 4) + b"\xff\xfe\x00\x01",
        ]
        for payload in abuses:
            s = socket_mod.create_connection(("localhost", server.tcp_port),
                                             timeout=10)
            try:
                if payload:
                    s.sendall(payload)
                s.settimeout(2.0)
                try:
                    s.recv(64)  # whatever the server does is fine
                except (socket_mod.timeout, OSError):
                    pass
            finally:
                s.close()
        # the server still serves clean requests
        c = TcpPredictorClient(port=server.tcp_port, timeout=10)
        assert len(c.predict(_rows(FIXTURE, 2))["scores"]) == 2
        c.close()

    def test_tcp_bad_json_payload_gets_error_frame(self, server):
        import socket as socket_mod

        from wide_deep_tpu.serving import protocol
        s = socket_mod.create_connection(("localhost", server.tcp_port),
                                         timeout=10)
        try:
            protocol.send_frame(s, b"this is not json{{{")
            resp = protocol.decode_response(protocol.recv_frame(s))
            assert "error" in resp
        finally:
            s.close()
