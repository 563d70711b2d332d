#!/usr/bin/env python
"""Convert a directory of images to a raw-pixel TFRecord file
(reference python/lib/utils/create_record.py analog): resize to HxW, write
raw uint8 bytes as the single `image` feature per Example."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="images -> TFRecord")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--width", type=int, default=224)
    args = p.parse_args()

    from PIL import Image
    from wide_deep_tpu.features.tfrecord import serialize_example, write_records

    def payloads():
        for name in sorted(os.listdir(args.input_dir)):
            path = os.path.join(args.input_dir, name)
            try:
                img = Image.open(path).convert("RGB")
            except OSError:
                print(f"skipping unreadable {name}")
                continue
            img = img.resize((args.width, args.height))
            yield serialize_example({"image": [img.tobytes()]})

    n = write_records(args.output, payloads())
    print(f"wrote {n} records to {args.output}")


if __name__ == "__main__":
    main()
