#!/usr/bin/env python
"""Export CLI (reference export_savedmodel.py analog): write a versioned
serving bundle from the latest (or explicit) checkpoint."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from wide_deep_tpu.config import Config
    config = Config(os.environ.get("WIDE_DEEP_CONF_DIR"))
    serving = config.serving
    p = argparse.ArgumentParser(description="export a serving bundle")
    p.add_argument("--export_dir", default=serving["model_dir"],
                   help="bundle root (versioned subdirs created inside)")
    p.add_argument("--model_type", default=serving["model_type"])
    p.add_argument("--model_dir", default=config.train["model_dir"],
                   help="training checkpoint root")
    p.add_argument("--checkpoint_path", default=serving["checkpoint_path"])
    p.add_argument("--model_version", type=int,
                   default=serving["model_version"])
    p.add_argument("--as_text", type=int, default=int(serving["as_text"]))
    args = p.parse_args()

    from wide_deep_tpu.serving.export import export_savedmodel
    path = export_savedmodel(
        config, args.export_dir, model_type=args.model_type,
        checkpoint_path=args.checkpoint_path,
        model_version=args.model_version, as_text=bool(args.as_text),
        model_dir=args.model_dir)
    print(f"exported bundle: {path}")


if __name__ == "__main__":
    main()
