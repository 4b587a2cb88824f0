"""Render / build configuration.

The reference hardcodes every knob as a compile-time ``#define`` or inline
constant (reference: RayTraceGlobal.hlsl:4-11, RayTraceTraversal.hlsl:7-9,
Graphics.cpp:364,528-529,795, main.cpp:7).  Here they live in one frozen
dataclass that is hashable, so it can be passed as a static argument to
``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """All static knobs of the renderer.

    Attributes:
      width/height: output resolution (reference: main.cpp:7 uses 800x800).
      bounces: number of reflection passes after the primary launch
        (reference: Graphics.cpp:795 dispatches CS_RAY_TRACE_REFLECTION 3x).
      enable_refraction: the reference allocates a refraction ray buffer but
        never dispatches the pass (reference: Graphics.cpp:805-809); we can
        actually run it.
      epsilon: Moeller-Trumbore determinant / min-distance epsilon
        (reference: RayTraceTraversal.hlsl:7, EPSILON .01).
      ray_offset: surface offset for secondary rays spawned by the primary
        launch (reference: RayTraceLaunch.hlsl:4, RAY_OFFSET .001).
      bounce_ray_offset: offset used by the reflection pass
        (reference: RayTraceReflection.hlsl:4, RAY_OFFSET .0001).
      reflection_decay / refraction_decay: intensity decay factors
        (reference: RayTraceGlobal.hlsl:10-11, both 1).
      intensity_min: bounce rays below this intensity are dead
        (reference: RayTraceGlobal.hlsl:9, INTENSITY_MIN 0).
      background: miss color (reference: RayTraceRender.hlsl:11-14).
      leaf_pad_multiple: leaves are padded to a multiple of this so shapes
        stay static across frames; the reference pads to numGrps*256
        (reference: Graphics.cpp:368,523 DATA_SIZE=256).
      ortho_scale: screen-space divisor of the reference's orthographic
        primary rays (reference: RayTraceLaunch.hlsl:23-24, the "/ 4.f").
      camera_mode: 'reference' = orthographic rays against WVP-transformed
        (clip-space, no w-divide) geometry, matching the reference exactly
        (reference: RayTraceLaunch.hlsl:23-27 + Graphics.cpp:50-53, quirks
        Q1/Q3 in SURVEY.md); 'perspective' = pinhole rays in world space.
      traversal_backend: 'auto' (on TPU: the fused u16 Pallas kernel below
        the 32767-leaf cap, the HBM windowed sweep above it; 'jnp'
        elsewhere), 'jnp' (XLA while_loop; measured 1.09 Mrays/s at
        1080p), 'pallas' (fused u16 VMEM kernel; 157 Mrays/s in-stream
        on coherent primaries, <= 32767 leaves) or 'hbm' (alias
        'sweep': persistent-refill HBM rank sweep — no VMEM scene
        ceiling; 30 Mrays/s at 102k tris, see ops/traverse_hbm.py).
        A 'pallas_pre' pre-order gather kernel existed through round 3
        but was never auto-selected and measured 0.02 Mrays/s at 100k
        leaves; deleted.
      sort_backend: 'lax' (one fused jax.lax.sort — the DEFAULT; the
        on-device in-stream A/B that bench.py records every run as
        sort_ab_build_ms is a statistical tie at 3k tris even with
        k=33 scans — 0.33 vs 0.32 ms, winner flips run-to-run — so the
        simpler backend with no VMEM size cap ships), 'bitonic' (the
        whole-problem-in-VMEM Pallas network, ops/sort_pallas.py —
        kept selectable + tested), 'auto' (bitonic on TPU; predates the
        A/B) or 'radix' (the reference's 32-dispatch 1-bit LSD radix
        sort, algorithm-for-algorithm; reference: RadixSortP1/P2.hlsl).
      dtype: compute dtype for geometry / shading.
    """

    width: int = 800
    height: int = 800
    bounces: int = 3
    enable_refraction: bool = False
    # Shadow rays (BASELINE.md config 3) — a capability beyond the
    # reference, which has no lights at all (its shading is
    # ambient + diffuse*tex, RayTraceRender.hlsl:16-29).  When enabled,
    # every primary hit fires one occlusion ray at ``light_pos`` (world
    # space; transformed like the geometry in 'reference' camera mode)
    # via any-hit traversal, and the diffuse term is scaled by
    # ``shadow_factor`` when occluded.  Occlusion is discrete
    # (stop-gradient), like hit ids.
    enable_shadows: bool = False
    light_pos: Tuple[float, float, float] = (0.0, 60.0, -60.0)
    shadow_factor: float = 0.35
    epsilon: float = 0.01
    ray_offset: float = 0.001
    bounce_ray_offset: float = 0.0001
    reflection_decay: float = 1.0
    refraction_decay: float = 1.0
    intensity_min: float = 0.0
    background: Tuple[float, float, float, float] = (0.5, 0.5, 0.5, 1.0)
    leaf_pad_multiple: int = 256
    ortho_scale: float = 4.0
    camera_mode: str = "reference"
    traversal_backend: str = "auto"
    sort_backend: str = "lax"
    # Leaf-attribute ([n, 40]) gather backend: 'auto' = on TPU the
    # in-VMEM pallas gather_rows kernel below ~32k leaves (whole table
    # in VMEM; MXU scatter-add backward) and the HBM 'windowed' gather
    # above (no VMEM ceiling; morton-sorted leaves + tiled rays keep the
    # id stream window-coherent — A/B at 102k tris: 152.6 vs 166.5 ms
    # frame, round 5); 'xla' = the packed row gather.
    shade_gather_backend: str = "auto"
    # Texture quad-table GATHER backend: 'windowed' runs the coherent
    # HBM window kernel (ops/gather_hbm.py — per 2048-ray block, DMA the
    # touched 128-row windows and lane-shuffle in VMEM; screen-space
    # continuity makes texel indices coherent), 'xla' the one-row XLA
    # gather.  'auto' = windowed on TPU: the XLA gather measured ~37-48
    # ms/pass inside the dense 1080p frame (its fusion re-prices the
    # gather per consumer channel) vs ~1 ms windowed
    # (scripts/tpu_dense_shade.py, round 5).
    texture_gather_backend: str = "auto"
    # 'uint8' stores the per-frame texture quad table as UNORM8 — the
    # reference's own texture format (DevIL loads 8-bit BMP/JPG,
    # Image.cpp:35-61) — quartering its HBM footprint; measured
    # perf-neutral (the 2M-row random gather is latency-bound, not
    # byte-bound), and it kills texture gradients (int cast), so the
    # default stays float32.
    texture_dtype: str = "float32"
    max_traversal_steps: int = 0  # 0 = auto (4 * n_leaves, safe upper bound)
    # Trace rays in (ray_tile x ray_tile)-pixel tile-major order instead of
    # row-major scanline order (0 = row-major).  A lane block in the Pallas
    # traversal kernels pays the union of its rays' tree paths; square
    # pixel tiles keep that union tight — the coherence analog of the
    # reference's 15x15 threadgroup dispatch (Graphics.cpp:788-792).  Pure
    # data permutation: images are bit-identical either way.
    ray_tile: int = 0
    # Tile SEQUENCE for ray_tile > 0: 'row' walks tiles along x (a
    # 2048-ray kernel block spans a wide strip), 'col' stacks them down
    # y first so blocks are ~square.  Pure data permutation either way
    # (reshape+transpose, no gathers); images bit-identical.  Measured
    # round 5: 'col' tightens TRAVERSAL (9% fewer micro-steps, 64.3 ->
    # 61.1 ms at 102k tris) but widens the texel-window footprint and
    # loses at the FRAME level (dense fwd+bwd 97.5 -> 132.4 ms), so
    # 'row' ships; 'col' stays for traversal-dominated workloads.
    ray_tile_order: str = "row"
    # Traverse rays in sequential chunks of this size (0 = one batch).
    # Bounds the lock-step penalty (one deep ray stalls only its chunk, not
    # the whole frame) and the live-state footprint for multi-megapixel
    # frames.  Must divide width*height when nonzero.
    traversal_chunk: int = 0
    # Run the ENTIRE per-ray pipeline (launch + bounces + shading) in
    # sequential tiles of this size (0 = whole frame at once).  Unlike
    # traversal_chunk this also bounds the autodiff residuals of the
    # differentiable shading path — required for megapixel fwd+bwd.
    ray_chunk: int = 0
    # With ray_chunk > 0: traverse each chunk first and SKIP the whole
    # shade/bounce path for chunks with no primary hit (lax.cond is a
    # real scalar branch under lax.map).  Bit-identical images — an
    # all-miss chunk is provably pure background (spawn intensities 0).
    # On TPU every lane pays the lock-step shade math whether or not its
    # ray hit anything; chunk culling is the TPU analog of GPU warps
    # retiring early.  Measured 144 -> 27 ms at 1080p on Image_Test
    # (sparse frame); costs one cond per chunk on dense frames.
    cull_empty_chunks: bool = True
    dtype: str = "float32"

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
