#!/usr/bin/env python
"""Replay a TSV file as a newline-delimited TCP stream (test producer for
the streaming ingestion path — features/stream.py; a real deployment points
StreamDataset/Trainer.train_stream at its event firehose instead).

Usage: python tools/stream_server.py --data_file data/train/train1 \
           --port 19000 [--rows_per_s 5000] [--loop]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_file", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=19000)
    p.add_argument("--rows_per_s", type=float, default=None)
    p.add_argument("--loop", action="store_true")
    args = p.parse_args()

    from wide_deep_tpu.features.stream import serve_file
    srv, t = serve_file(args.data_file, args.host, args.port,
                        rows_per_s=args.rows_per_s, loop=args.loop)
    print(f"streaming {args.data_file} on {args.host}:"
          f"{srv.getsockname()[1]}", flush=True)
    t.join()


if __name__ == "__main__":
    main()
