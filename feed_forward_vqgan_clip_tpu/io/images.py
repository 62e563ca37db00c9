"""Host-side image utilities: grid assembly + PNG writing.

Replaces torchvision.utils.make_grid / to_pil_image saves
(/root/reference/main.py:899-949, 1060-1061).
"""

import numpy as np
from PIL import Image


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2, pad_value: float = 0.0) -> np.ndarray:
    """images: (N, H, W, C) floats in [0,1] -> (H', W', C) grid, torchvision layout."""
    images = np.asarray(images, np.float32)
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nr = -(-n // ncol)
    grid = np.full(
        (nr * (h + padding) + padding, ncol * (w + padding) + padding, c),
        pad_value,
        np.float32,
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y : y + h, x : x + w] = images[i]
    return grid


def save_image(img: np.ndarray, path: str) -> None:
    """img: (H, W, C) floats in [0,1] -> 8-bit PNG."""
    arr = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8)).save(path)


def save_grid(images, path: str, nrow: int = 8) -> None:
    save_image(make_grid(np.asarray(images), nrow=nrow), path)
