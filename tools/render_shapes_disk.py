"""Render the procedural shapes distribution to disk as a JPEG
class-folder tree + one uncompressed tar — the dataset for the
disk-fed training runs (RUNS/fgan32_disk_tpu_r4; matches the
reference's CelebA folder/tar ingestion shapes,
reference util/tar_loader.py:44-317, util/data_loader.py:431-542).

Usage:
    python tools/render_shapes_disk.py [root=/tmp/shapes_disk] [n=100000]

Writes {root}/train/class_{k}/im{i:06d}.jpg (quality 95) and
{root}/shapes_100k.tar. Pure host-side; no jax import.
"""

from __future__ import annotations

import os
import sys
import tarfile
import time


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/shapes_disk"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    from PIL import Image

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from fastfourierconvolution_tpu.data.datasets import ShapesDataset

    t0 = time.time()
    ds = ShapesDataset(n=n, size=32, seed=2020)
    print(f"rendered {n} images in {time.time() - t0:.1f}s")

    train = os.path.join(root, "train")
    for k in range(ds.NUM_CLASSES):
        os.makedirs(os.path.join(train, f"class_{k}"), exist_ok=True)
    t0 = time.time()
    for i in range(n):
        k = int(ds.labels[i])
        Image.fromarray(ds.images[i]).save(
            os.path.join(train, f"class_{k}", f"im{i:06d}.jpg"),
            quality=95,
        )
        if (i + 1) % 20_000 == 0:
            print(f"  {i + 1}/{n} JPEGs ({time.time() - t0:.1f}s)")
    print(f"wrote JPEG tree in {time.time() - t0:.1f}s")

    tar_path = os.path.join(root, "shapes_100k.tar")
    t0 = time.time()
    with tarfile.open(tar_path, "w") as tf:
        tf.add(train, arcname="train")
    print(f"wrote {tar_path} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
