#!/usr/bin/env python
"""Scoring-server CLI (tensorflow_model_server analog): load a bundle and
serve gRPC (:port) + native TCP (:port+1)."""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from wide_deep_tpu.config import Config
    config = Config(os.environ.get("WIDE_DEEP_CONF_DIR"))
    server_conf = config.serving["server"]
    p = argparse.ArgumentParser(description="wide_deep_tpu scoring server")
    p.add_argument("--model_base_path", default=config.serving["model_dir"],
                   help="bundle root containing versioned subdirs")
    p.add_argument("--model_version", type=int, default=None,
                   help="explicit version (default: latest)")
    p.add_argument("--port", type=int, default=server_conf["port"])
    p.add_argument("--model_name", default=server_conf["model_name"])
    p.add_argument("--max_batch_size", type=int,
                   default=server_conf["max_batch_size"])
    p.add_argument("--batch_timeout_micros", type=int,
                   default=server_conf["batch_timeout_micros"],
                   help="micro-batch window for coalescing concurrent "
                        "requests into one device call (0 = drain-only)")
    p.add_argument("--auth_token", default=server_conf.get("auth_token"),
                   help="shared-secret request auth (empty = open)")
    p.add_argument("--tls_cert", default=server_conf.get("tls_cert"),
                   help="PEM server certificate: enables TLS on both "
                        "transports (the native C++ client is plaintext — "
                        "front it with a TLS proxy)")
    p.add_argument("--tls_key", default=server_conf.get("tls_key"),
                   help="PEM server private key (required with --tls_cert)")
    p.add_argument("--tls_ca", default=server_conf.get("tls_ca"),
                   help="PEM CA bundle: require client certificates it "
                        "signed (mutual TLS)")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)
    from wide_deep_tpu.serving.export import latest_version_dir
    from wide_deep_tpu.serving.server import PredictorServer, ServingModel
    if args.model_version is not None:
        version_dir = os.path.join(args.model_base_path,
                                   str(args.model_version))
    else:
        version_dir = latest_version_dir(args.model_base_path)
    model = ServingModel(version_dir, args.max_batch_size, args.model_name,
                         batch_timeout_micros=args.batch_timeout_micros)
    model.warmup()
    # watch for new versions unless one was pinned explicitly
    watch = None if args.model_version is not None else args.model_base_path
    server = PredictorServer(model, port=args.port, model_base_path=watch,
                             auth_token=args.auth_token or None,
                             tls_cert=args.tls_cert or None,
                             tls_key=args.tls_key or None,
                             tls_ca=args.tls_ca or None)
    server.start()
    print(f"serving {args.model_name} from {version_dir} "
          f"(grpc :{args.port}, tcp :{args.port + 1})", flush=True)
    server.wait()


if __name__ == "__main__":
    main()
