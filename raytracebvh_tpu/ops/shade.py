"""Shading: barycentric interpolation, texture sampling, pixel color.

Replaces RayTraceRender.hlsl / RayTraceHelper.hlsl.  Everything here is
plain differentiable jnp — gradients flow to vertices, normals, uv,
material colors and textures (a capability the reference does not have).
"""

from __future__ import annotations

import jax.numpy as jnp


def barycentric_normal_uv(tri_pos, tri_normal, tri_uv, point):
    """Area-ratio interpolation of normal and uv at ``point``.

    Matches getNromalTexCoord (reference: RayTraceHelper.hlsl:12-35): the
    weights are sub-triangle areas over the full triangle area.  Note the
    reference divides each sub-area by the *parallelogram* area a0 without
    halving — the ratios are identical, so we keep its exact formula.
    """
    v0 = tri_pos[..., 0, :] - point
    v1 = tri_pos[..., 1, :] - point
    v2 = tri_pos[..., 2, :] - point
    e01 = tri_pos[..., 0, :] - tri_pos[..., 1, :]
    e02 = tri_pos[..., 0, :] - tri_pos[..., 2, :]
    a0 = jnp.linalg.norm(jnp.cross(e01, e02), axis=-1)
    a0 = jnp.where(a0 == 0.0, 1.0, a0)
    w0 = jnp.linalg.norm(jnp.cross(v1, v2), axis=-1) / a0
    w1 = jnp.linalg.norm(jnp.cross(v2, v0), axis=-1) / a0
    w2 = jnp.linalg.norm(jnp.cross(v0, v1), axis=-1) / a0
    uv = (
        tri_uv[..., 0, :] * w0[..., None]
        + tri_uv[..., 1, :] * w1[..., None]
        + tri_uv[..., 2, :] * w2[..., None]
    )
    normal = (
        tri_normal[..., 0, :] * w0[..., None]
        + tri_normal[..., 1, :] * w1[..., None]
        + tri_normal[..., 2, :] * w2[..., None]
    )
    return uv, normal


def sample_texture(textures, tex_hw, tex_id, uv):
    """Bilinear sample with wrap addressing, SampleLevel(lod 0) semantics
    (reference: RayTraceRender.hlsl:24-26; sampler created at
    Image.cpp:154-169).  ``tex_id`` -1 returns white
    (reference: RayTraceRender.hlsl:19-27).

    DirectX texture space puts v=0 at the top row; OBJ vt has v=0 at the
    bottom, and the loader flips v on import (io/obj.py) to match.
    """
    tid = jnp.maximum(tex_id, 0)
    h = tex_hw[tid, 0].astype(uv.dtype)
    w = tex_hw[tid, 1].astype(uv.dtype)
    u = uv[..., 0] - jnp.floor(uv[..., 0])  # wrap
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def texel(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), w.astype(jnp.int32))
        yi = jnp.mod(yi.astype(jnp.int32), h.astype(jnp.int32))
        return textures[tid, yi, xi]

    c00 = texel(x0, y0)
    c10 = texel(x0 + 1, y0)
    c01 = texel(x0, y0 + 1)
    c11 = texel(x0 + 1, y0 + 1)
    color = (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )
    white = jnp.ones_like(color)
    return jnp.where((tex_id >= 0)[..., None], color, white)


def render_pixel(materials, mat_id, textures, tex_hw, uv):
    """saturate(ambient + diffuse * texColor)
    (reference: RayTraceRender.hlsl:16-29)."""
    tex_id = materials.tex_id[mat_id]
    tex_color = sample_texture(textures, tex_hw, tex_id, uv)
    color = materials.ambient[mat_id] + materials.diffuse[mat_id] * tex_color
    return jnp.clip(color, 0.0, 1.0)


def reflect(direction, normal):
    """HLSL reflect(i, n) = i - 2*dot(i, n)*n."""
    return direction - 2.0 * jnp.sum(direction * normal, axis=-1, keepdims=True) * normal


def refract(direction, normal, eta):
    """HLSL refract(i, n, eta); returns 0 on total internal reflection."""
    cosi = jnp.sum(direction * normal, axis=-1, keepdims=True)
    k = 1.0 - eta[..., None] ** 2 * (1.0 - cosi**2)
    out = eta[..., None] * direction - (eta[..., None] * cosi + jnp.sqrt(jnp.maximum(k, 0.0))) * normal
    return jnp.where(k >= 0.0, out, jnp.zeros_like(out))


def normalize(v, eps=1e-30):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)
