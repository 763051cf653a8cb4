"""RGB framebuffer + heatmap rendering (ASCII and PPM/PNG export).

Parity: reference visualization layer (Visualization/Rendering/
FrameBuffer.ixx:24, HeatMapRenderer.ixx, per-component visualizers
Visualization/Components/*.ixx; Samples/Viz). Host-side numpy — rendering is
not a TPU workload; tensors are pulled D2H for display.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

ASCII_RAMP = " .:-=+*#%@"


class FrameBuffer:
    """RGB8 framebuffer (FrameBuffer.ixx parity)."""

    def __init__(self, width: int, height: int):
        if width <= 0 or height <= 0:
            raise ValueError("framebuffer dims must be positive")
        self.width = width
        self.height = height
        self.pixels = np.zeros((height, width, 3), np.uint8)

    def clear(self, rgb=(0, 0, 0)) -> None:
        self.pixels[:] = np.asarray(rgb, np.uint8)

    def set_pixel(self, x: int, y: int, rgb) -> None:
        if 0 <= x < self.width and 0 <= y < self.height:
            self.pixels[y, x] = np.asarray(rgb, np.uint8)

    def blit(self, x: int, y: int, img: np.ndarray) -> None:
        h, w = img.shape[:2]
        x1, y1 = min(x + w, self.width), min(y + h, self.height)
        if x < x1 and y < y1:
            self.pixels[y:y1, x:x1] = img[: y1 - y, : x1 - x]

    def to_ppm(self, path: str | Path) -> None:
        with open(path, "wb") as f:
            f.write(f"P6 {self.width} {self.height} 255\n".encode())
            f.write(self.pixels.tobytes())


# Simple viridis-like 5-stop colormap.
_STOPS = np.array(
    [[68, 1, 84], [59, 82, 139], [33, 145, 140], [94, 201, 98], [253, 231, 37]],
    np.float32,
)


def colormap(values: np.ndarray) -> np.ndarray:
    """[H,W] floats in [0,1] → [H,W,3] uint8 via the viridis-like ramp."""
    v = np.clip(values, 0.0, 1.0)
    pos = v * (len(_STOPS) - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, len(_STOPS) - 1)
    frac = (pos - lo)[..., None]
    rgb = _STOPS[lo] * (1 - frac) + _STOPS[hi] * frac
    return rgb.astype(np.uint8)


class HeatMapRenderer:
    """Tensor → normalized heatmap (HeatMapRenderer.ixx parity)."""

    def __init__(self, max_size: int = 256):
        self.max_size = max_size

    def _prepare(self, tensor) -> np.ndarray:
        arr = np.asarray(tensor, np.float32)
        if arr.ndim == 1:
            arr = arr[None, :]
        while arr.ndim > 2:
            arr = arr.reshape(-1, arr.shape[-1])
        # Downsample by striding to fit max_size.
        sy = max(1, arr.shape[0] // self.max_size)
        sx = max(1, arr.shape[1] // self.max_size)
        arr = arr[::sy, ::sx]
        lo, hi = float(arr.min()), float(arr.max())
        return (arr - lo) / (hi - lo + 1e-12)

    def render_rgb(self, tensor) -> np.ndarray:
        return colormap(self._prepare(tensor))

    def render_ascii(self, tensor, width: int = 64) -> str:
        norm = self._prepare(tensor)
        sy = max(1, norm.shape[0] // (width // 2))
        sx = max(1, norm.shape[1] // width)
        small = norm[::sy, ::sx]
        idx = (small * (len(ASCII_RAMP) - 1)).astype(int)
        return "\n".join("".join(ASCII_RAMP[i] for i in row) for row in idx)

    def render_to(self, fb: FrameBuffer, tensor, x: int = 0, y: int = 0) -> None:
        fb.blit(x, y, self.render_rgb(tensor))


def render_training_curve(
    losses, width: int = 60, height: int = 12, label: str = "loss"
) -> str:
    """ASCII sparkline of per-epoch losses (Viz sample analogue)."""
    if not losses:
        return "(no data)"
    vals = np.asarray(losses, np.float32)
    lo, hi = float(vals.min()), float(vals.max())
    span = hi - lo + 1e-12
    cols = np.interp(
        np.linspace(0, len(vals) - 1, width), np.arange(len(vals)), vals
    )
    grid = [[" "] * width for _ in range(height)]
    for xcol, v in enumerate(cols):
        yrow = int((1.0 - (v - lo) / span) * (height - 1))
        grid[yrow][xcol] = "*"
    lines = ["".join(r) for r in grid]
    return (
        f"{label}: {hi:.4g} (max)\n" + "\n".join(lines) + f"\n{label}: {lo:.4g} (min)"
    )


def visualize_params(params, renderer: Optional[HeatMapRenderer] = None) -> str:
    """ASCII weight-heatmap digest per parameter (component visualizers)."""
    import jax

    renderer = renderer or HeatMapRenderer()
    out = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        arr = np.asarray(leaf)
        if arr.ndim < 1 or arr.size < 4:
            continue
        out.append(f"--- {name} {arr.shape} ---")
        out.append(renderer.render_ascii(arr, width=48))
    return "\n".join(out)
