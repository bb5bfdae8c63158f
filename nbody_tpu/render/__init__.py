"""Host-side rendering: orbit camera, color mapping, point-sprite renderer,
async device→host point stream, diagnostics panel.

The reference renders via zero-copy CUDA↔OpenGL interop
(reference: src/render/, include/nbody/cuda_gl_interop.hpp). A TPU has no
display path, so the TPU-native design replaces interop with an async
device→host point-buffer stream (double-buffered `jax.device_get` of a
decimated snapshot) feeding a pure-NumPy point renderer; camera math and
the three color modes carry over unchanged.
"""

from nbody_tpu.render.camera import Camera
from nbody_tpu.render.color import ColorMapper
from nbody_tpu.render.renderer import PointRenderer
from nbody_tpu.render.stream import PointStream
from nbody_tpu.render.terminal import TerminalView
from nbody_tpu.render.ui import UIPanel

__all__ = [
    "Camera",
    "ColorMapper",
    "PointRenderer",
    "PointStream",
    "TerminalView",
    "UIPanel",
]
