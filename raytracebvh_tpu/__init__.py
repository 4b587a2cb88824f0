"""raytracebvh_tpu — TPU-native differentiable LBVH ray tracer.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
Fierykev/RayTraceBVH (a DirectX 12 compute ray tracer; see SURVEY.md):
per-frame LBVH construction (30-bit morton codes, stable sort, Karras-2012
hierarchy emit, AABB fit), stackless batched traversal with
Moeller-Trumbore intersection, material/texture shading, and multi-bounce
reflections — plus differentiability and multi-chip sharding the reference
never had.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: frame-pipeline compiles at megapixel
# resolutions take minutes through the TPU compile service; identical HLO
# must never compile twice across processes.  (The reference's analog is
# its precompiled .cso shader cache, Graphics.cpp:245-284.)
if _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "RTBVH_COMPILE_CACHE",
            _os.path.expanduser("~/.cache/rtbvh_xla"),
        ),
    )

from .config import RenderConfig
from .core.types import BVH, Camera, HitRecord, Materials, Rays, Scene
from .pipeline import build_bvh, render_frame, render_frame_jit

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "BVH",
    "Camera",
    "HitRecord",
    "Materials",
    "Rays",
    "Scene",
    "build_bvh",
    "render_frame",
    "render_frame_jit",
]
