"""Image output.

The reference displays through a GL blit (shaders/render.*) and never saves
to disk despite vendoring stb_image_write (PnRT.hpp:7-9); the TPU build's
display path is a file."""

from __future__ import annotations

import numpy as np


def tonemap(image: np.ndarray, gamma: float = 2.2, exposure: float = 1.0) -> np.ndarray:
    """Linear radiance -> display [0,1] with simple gamma.  The reference's
    blit shows the clamped linear buffer directly (render.frag); gamma is
    optional here for nicer previews."""
    img = np.clip(np.asarray(image, np.float32) * exposure, 0.0, 1.0)
    if gamma and gamma != 1.0:
        img = img ** (1.0 / gamma)
    return img


def save_png(path: str, image: np.ndarray, gamma: float = 2.2) -> None:
    """Save [H, W, 3] linear float image to PNG."""
    from PIL import Image

    img8 = (tonemap(image, gamma=gamma) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(img8).save(path)


def mse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
