#!/usr/bin/env python
"""Generate the bundled image fixtures under data/image/ (deterministic).

The reference ships 24 jpegs + train.tfrecords (reference data/image/); we
bundle the analog as *generated* images — seeded gradients with geometric
shapes — plus the raw-pixel TFRecord built from them through the same
pipeline as tools/create_record.py, so the CNN arm's real data path
(PNG -> TFRecord -> ImageCsvDataset -> joint train) is exercised without
shipping third-party image bytes.

Usage: python tools/generate_sample_images.py [--n 24] [--size 224]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_image(rng: np.random.Generator, size: int) -> np.ndarray:
    """One synthetic RGB image: directional gradient + rectangles + disc."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    angle = rng.uniform(0, 2 * np.pi)
    base = (np.cos(angle) * xx + np.sin(angle) * yy + 1.0) / 2.0
    img = np.stack([base * rng.uniform(0.4, 1.0) for _ in range(3)], axis=-1)
    for _ in range(rng.integers(1, 4)):
        x0, y0 = rng.integers(0, size - 8, 2)
        w, h = rng.integers(8, size // 2, 2)
        img[y0:y0 + h, x0:x0 + w] = rng.uniform(0, 1, 3)
    cx, cy = rng.uniform(0.2, 0.8, 2) * size
    r = rng.uniform(0.05, 0.25) * size
    disc = ((np.mgrid[0:size, 0:size][1] - cx) ** 2
            + (np.mgrid[0:size, 0:size][0] - cy) ** 2) < r * r
    img[disc] = rng.uniform(0, 1, 3)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=24)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--out_dir", default=os.path.join(REPO, "data", "image"))
    p.add_argument("--seed", type=int, default=123)
    args = p.parse_args()

    from PIL import Image

    from wide_deep_tpu.features.tfrecord import (serialize_example,
                                                 write_records)

    train_dir = os.path.join(args.out_dir, "train")
    os.makedirs(train_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    paths = []
    for i in range(args.n):
        arr = make_image(rng, args.size)
        path = os.path.join(train_dir, f"img{i:03d}.png")
        Image.fromarray(arr).save(path)
        paths.append(path)

    def payloads():
        for path in paths:
            img = Image.open(path).convert("RGB").resize(
                (args.size, args.size))
            yield serialize_example({"image": [img.tobytes()]})

    record_path = os.path.join(args.out_dir, "train.tfrecords")
    n = write_records(record_path, payloads())
    print(f"wrote {args.n} pngs to {train_dir} and {n} records to "
          f"{record_path}")


if __name__ == "__main__":
    main()
