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
    p.add_argument("--model_config", default=None,
                   help="YAML file serving MULTIPLE models (TF-Serving "
                        "--model_config_file analog): a `models:` list of "
                        "{name, base_path, version?, max_batch_size?}; "
                        "requests route by model_name, unpinned models "
                        "hot-reload independently.  Overrides "
                        "--model_base_path/--model_name/--model_version")
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

    if args.model_config:
        import yaml
        with open(args.model_config) as f:
            spec = yaml.safe_load(f)
        entries = spec["models"] if isinstance(spec, dict) else spec
        if not entries:
            raise SystemExit(f"{args.model_config}: no models listed")
    else:
        entries = [{"name": args.model_name,
                    "base_path": args.model_base_path,
                    "version": args.model_version}]

    models, watch, served = [], {}, []
    for e in entries:
        if e.get("version") is not None:
            version_dir = os.path.join(e["base_path"], str(e["version"]))
        else:
            version_dir = latest_version_dir(e["base_path"])
            # watch for new versions unless one was pinned explicitly
            watch[e["name"]] = e["base_path"]
        m = ServingModel(version_dir,
                         int(e.get("max_batch_size", args.max_batch_size)),
                         e["name"],
                         batch_timeout_micros=args.batch_timeout_micros)
        m.warmup()
        models.append(m)
        served.append(f"{e['name']} from {version_dir}")

    server = PredictorServer(models, port=args.port,
                             model_base_paths=watch,
                             auth_token=args.auth_token or None,
                             tls_cert=args.tls_cert or None,
                             tls_key=args.tls_key or None,
                             tls_ca=args.tls_ca or None)
    server.start()
    print(f"serving {'; '.join(served)} "
          f"(grpc :{args.port}, tcp :{args.port + 1})", flush=True)
    server.wait()


if __name__ == "__main__":
    main()
