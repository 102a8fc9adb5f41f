"""Config tree, presets, logging/observability utilities."""

from .config import Config, PRESETS, make_config, parse_cli  # noqa: F401
from .logging import (  # noqa: F401
    ScalarLogger,
    make_grid,
    save_image_grid,
    save_loss_plot,
)
