#!/usr/bin/env python
"""Serving client CLI (reference tensorflow_serving/client.py analog):
score TSV rows against a running server, or run the threaded load test."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="wide_deep_tpu serving client")
    p.add_argument("--server_host", default="localhost")
    p.add_argument("--server_port", type=int, default=8500)
    p.add_argument("--transport", choices=["grpc", "tcp"], default="grpc")
    p.add_argument("--model_name", default="wide_deep")
    p.add_argument("--status", action="store_true",
                   help="print served models + versions and exit "
                        "(TF-Serving GetModelStatus analog)")
    p.add_argument("--data_file", default=None)
    p.add_argument("--num_rows", type=int, default=10)
    p.add_argument("--load_test", action="store_true",
                   help="run the concurrency load harness instead")
    p.add_argument("--num_requests", type=int, default=100)
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--tls_ca", default=None,
                   help="PEM root cert: connect over TLS, verify the server")
    p.add_argument("--tls_cert", default=None,
                   help="PEM client certificate (mutual TLS)")
    p.add_argument("--tls_key", default=None,
                   help="PEM client key (with --tls_cert)")
    args = p.parse_args()

    from wide_deep_tpu.serving.client import (PredictorClient,
                                              TcpPredictorClient,
                                              do_inference)
    rows = []
    if not args.status:
        if not args.data_file:
            p.error("--data_file is required unless --status")
        with open(args.data_file) as f:
            rows = [line.rstrip("\n") for line in f if line.strip()]
        rows = rows[:max(args.num_rows, 1)] if not args.load_test else rows

    tls = dict(tls_ca=args.tls_ca, tls_cert=args.tls_cert,
               tls_key=args.tls_key)
    if args.transport == "grpc":
        client = PredictorClient(args.server_host, args.server_port,
                                 args.model_name, **tls)
    else:
        client = TcpPredictorClient(args.server_host, args.server_port,
                                    args.model_name, **tls)
    if args.status:
        for m in client.status()["models"]:
            print("\t".join(f"{k}: {v}" for k, v in sorted(m.items())))
    elif args.load_test:
        stats = do_inference(client, rows, args.num_requests,
                             args.concurrency)
        for k, v in sorted(stats.items()):
            print(f"{k}: {v:.3f}" if isinstance(v, float) else f"{k}: {v}")
    else:
        resp = client.predict(rows)
        for i, (score, cid) in enumerate(zip(resp["scores"],
                                             resp["class_ids"])):
            print(f"{i}\tclass: {cid}\tprobability: {score[cid]:.6f}")
    client.close()


if __name__ == "__main__":
    main()
