"""Visualization (reference layer 9: Visualization/, Samples/Viz)."""

from mila_tpu.viz.framebuffer import (
    FrameBuffer,
    HeatMapRenderer,
    colormap,
    render_training_curve,
    visualize_params,
)

__all__ = [
    "FrameBuffer",
    "HeatMapRenderer",
    "colormap",
    "render_training_curve",
    "visualize_params",
]
