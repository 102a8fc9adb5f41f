"""Feature-map visualization (reference test.py:146-208 `get_filters`).

Captures per-block intermediate activations of an FFC generator via
flax's ``capture_intermediates`` and renders channel-mean grayscale maps
into one figure — the reference's per-layer diagnostic plots.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import numpy as np


def capture_feature_maps(
    model, variables, z, labels=None
) -> Dict[str, np.ndarray]:
    """Run an eval-mode forward capturing every block's output.

    Returns {sow-path: channel-mean grayscale map (H, W)} for all 4-D
    intermediates, ordered by depth.
    """
    args = (z, False, labels) if labels is not None else (z, False)
    _, state = model.apply(
        variables,
        *args,
        rngs={"noise": jax.random.PRNGKey(0)},
        capture_intermediates=True,
        mutable=["intermediates"],
    )
    maps: Dict[str, np.ndarray] = {}

    def visit(path: str, value):
        if isinstance(value, dict):
            for k, v in value.items():
                visit(f"{path}/{k}" if path else str(k), v)
        elif isinstance(value, tuple):
            for i, v in enumerate(value):
                visit(f"{path}[{i}]" if len(value) > 1 else path, v)
        else:
            arr = np.asarray(value)
            if arr.ndim == 4:  # (B, H, W, C): channel-mean of sample 0
                maps[path] = arr[0].mean(axis=-1)

    visit("", state["intermediates"])
    return maps


def save_feature_map_figure(
    maps: Dict[str, np.ndarray], path: str, max_maps: int = 20
) -> str:
    """Grid figure of grayscale feature maps (reference's 5x4 plot)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    items = list(maps.items())[:max_maps]
    cols = 4
    rows = -(-len(items) // cols)
    fig = plt.figure(figsize=(4 * cols, 4 * rows))
    for i, (name, fm) in enumerate(items):
        ax = fig.add_subplot(rows, cols, i + 1)
        ax.imshow(fm, cmap="gray")
        ax.set_title(name.split("/")[0][:30], fontsize=8)
        ax.axis("off")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path
