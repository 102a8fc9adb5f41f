"""Observability: CSV scalar logs, loss plots, sample grids, progress.

Replicates the reference's logging surface (SURVEY §5.5): loss CSV dump
+ offline plot (reference sngan_complete.py:365-369, generate_plot.py),
matplotlib loss curves (util/save_snapshop.py:8-17), PNG sample grids
per eval (fgan_complete.py:437-438), tqdm console progress with loss
postfix (fgan_complete.py:354,396-402). TensorBoard scalars are written
as JSONL event records (no TB dependency in this image; the file is
trivially convertible).
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional

import numpy as np


class ScalarLogger:
    """CSV + JSONL + TensorBoard-event scalar logging.

    CSV mirrors the reference's gan_losses.csv (sngan_complete.py:365);
    TensorBoard events mirror its SummaryWriter scalars
    (fgan_complete.py:353,396-402) — written via tensorboardX when
    available, silently skipped otherwise (no hard dependency)."""

    def __init__(self, dir_logs: str, csv_name: str = "gan_losses.csv",
                 tensorboard: bool = True):
        os.makedirs(dir_logs, exist_ok=True)
        self.csv_path = os.path.join(dir_logs, csv_name)
        self.jsonl_path = os.path.join(dir_logs, "scalars.jsonl")
        self._csv_file = open(self.csv_path, "a", newline="")
        self._csv = csv.writer(self._csv_file)
        if self._csv_file.tell() == 0:
            self._csv.writerow(["step", "loss_G", "loss_D", "lr"])
        self._jsonl = open(self.jsonl_path, "a")
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(
                    logdir=os.path.join(dir_logs, "tb")
                )
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        # the CSV mirrors the reference's gan_losses.csv (loss rows only);
        # metric/other scalars go to the JSONL stream + TB events
        if "loss_g" in scalars:
            self._csv.writerow(
                [step, scalars.get("loss_g"), scalars.get("loss_d"),
                 scalars.get("lr")]
            )
        self._jsonl.write(
            json.dumps({"step": step, "time": time.time(), **scalars}) + "\n"
        )
        if self._tb is not None:
            for key, value in scalars.items():
                try:
                    self._tb.add_scalar(key, float(value), step)
                except (TypeError, ValueError):
                    pass

    def log_image_grid(self, step: int, grid_hwc, tag: str = "observations"):
        """TB image record (the reference's writer.add_image of sample
        grids, fgan_complete.py:434-436)."""
        if self._tb is not None:
            import numpy as _np

            self._tb.add_image(
                tag, _np.transpose(grid_hwc, (2, 0, 1)), step
            )

    def flush(self) -> None:
        self._csv_file.flush()
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._csv_file.close()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def save_loss_plot(csv_path: str, out_path: Optional[str] = None) -> str:
    """gan_losses.csv -> gan_losses.png (reference generate_plot.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps, g, d = [], [], []
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            if not row.get("loss_G") or not row.get("loss_D"):
                continue  # tolerate partial rows (e.g. legacy metric rows)
            steps.append(int(row["step"]))
            g.append(float(row["loss_G"]))
            d.append(float(row["loss_D"]))
    if not steps:
        raise ValueError(f"no loss rows in {csv_path}")
    out_path = out_path or csv_path.replace(".csv", ".png")
    plt.figure(figsize=(10, 5))
    plt.title("Generator and Discriminator Loss During Training")
    plt.plot(steps, g, label="G")
    plt.plot(steps, d, label="D")
    plt.xlabel("iterations")
    plt.ylabel("loss")
    plt.legend()
    plt.savefig(out_path)
    plt.close()
    return out_path


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2) -> np.ndarray:
    """Tile (N, H, W, C) images into one grid image (torchvision
    make_grid equivalent). Accepts float [-1,1] or uint8."""
    if images.dtype != np.uint8:
        images = (
            (np.clip(images, -1.0, 1.0) * 0.5 + 0.5) * 255
        ).astype(np.uint8)
    n, h, w, c = images.shape
    ncol = nrow
    nrows = -(-n // ncol)
    grid = np.zeros(
        (nrows * (h + pad) + pad, ncol * (w + pad) + pad, c), np.uint8
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = r * (h + pad) + pad
        x0 = col * (w + pad) + pad
        grid[y0 : y0 + h, x0 : x0 + w] = images[i]
    if c == 1:
        grid = np.repeat(grid, 3, axis=-1)
    return grid


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8) -> str:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(make_grid(images, nrow)).save(path)
    return path
