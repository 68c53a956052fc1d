"""Dataset/prediction visualization (reference deepcv.meta.data.viz — a
thumbnail-plotting stub there, viz.py; working implementation here).

Host-side utilities: batch -> image grid (numpy/PIL), saved to disk or
returned as an array for TensorBoard ``add_image``.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Union

import numpy as np

__all__ = ["to_uint8", "make_grid", "save_image_grid"]


def to_uint8(images, mean: Optional[Sequence[float]] = None,
             std: Optional[Sequence[float]] = None) -> np.ndarray:
    """float batch (optionally normalized) -> uint8 NHWC."""
    x = np.asarray(images, np.float32)
    if mean is not None and std is not None:
        x = x * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    if x.dtype != np.uint8:
        x = np.clip(x, 0.0, 1.0) if x.max() <= 1.5 else np.clip(x / 255.0, 0, 1)
        x = (x * 255.0 + 0.5).astype(np.uint8)
    return x


def make_grid(images, n_cols: int = 8, padding: int = 2,
              pad_value: int = 255) -> np.ndarray:
    """Tile a uint8 NHWC batch into one (H', W', C) grid image."""
    imgs = to_uint8(images)
    n, h, w, c = imgs.shape
    n_cols = min(n_cols, n)
    n_rows = -(-n // n_cols)
    grid = np.full((n_rows * (h + padding) + padding,
                    n_cols * (w + padding) + padding, c), pad_value, np.uint8)
    for i in range(n):
        r, col = divmod(i, n_cols)
        y0 = padding + r * (h + padding)
        x0 = padding + col * (w + padding)
        grid[y0:y0 + h, x0:x0 + w] = imgs[i]
    return grid


def save_image_grid(images, path: Union[str, Path], n_cols: int = 8,
                    labels: Optional[Sequence] = None) -> Path:
    """Save a thumbnail grid (PNG via PIL); returns the path."""
    from PIL import Image, ImageDraw

    grid = make_grid(images, n_cols=n_cols)
    if grid.shape[-1] == 1:
        grid = np.repeat(grid, 3, axis=-1)
    img = Image.fromarray(grid)
    if labels is not None:
        draw = ImageDraw.Draw(img)
        n, h, w = len(labels), images.shape[1], images.shape[2]
        for i, lab in enumerate(labels):
            r, col = divmod(i, min(n_cols, n))
            draw.text((2 + col * (w + 2) + 2, 2 + r * (h + 2)), str(lab),
                      fill=(255, 0, 0))
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    img.save(path)
    return path
