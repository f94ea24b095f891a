"""Camera ray generation (counterpart of src/cameras/{perspective,
orthographic,environment}.cpp GenerateRay).

Batched: takes film-plane sample positions (N,2) in raster space plus lens
samples, returns world-space rays. Thin-lens depth of field matches
perspective.cpp:69-117."""

from __future__ import annotations

import jax.numpy as jnp

from tpupt.core.sampling import concentric_sample_disk
from tpupt.core.vecmath import normalize
from tpupt.scene.flatten import CAM_ENVIRONMENT, CAM_ORTHOGRAPHIC, CAM_PERSPECTIVE


def _xform_point(m, p):
    r = jnp.einsum("ij,...j->...i", m[:3, :3], p) + m[:3, 3]
    w = jnp.einsum("j,...j->...", m[3, :3], p) + m[3, 3]
    return r / w[..., None]


def _xform_vector(m, v):
    return jnp.einsum("ij,...j->...i", m[:3, :3], v)


def generate_rays(cam_type: int, raster_to_camera, cam_to_world,
                  p_raster, u_lens, lens_radius: float, focal_distance: float,
                  xres: int = 0, yres: int = 0):
    """p_raster: (N,2) film positions; u_lens: (N,2) in [0,1)^2.
    Returns (o_world, d_world)."""
    n = p_raster.shape[0]
    if cam_type == CAM_ENVIRONMENT:
        # equirectangular (cameras/environment.cpp:46)
        theta = jnp.pi * p_raster[:, 1] / yres
        phi = 2 * jnp.pi * p_raster[:, 0] / xres
        d_cam = jnp.stack(
            [jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta),
             jnp.sin(theta) * jnp.sin(phi)], -1)
        o_cam = jnp.zeros((n, 3))
    else:
        p_film = jnp.concatenate([p_raster, jnp.zeros((n, 1))], -1)
        p_cam = _xform_point(raster_to_camera, p_film)
        if cam_type == CAM_ORTHOGRAPHIC:
            o_cam = p_cam
            d_cam = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
        else:
            o_cam = jnp.zeros((n, 3))
            d_cam = normalize(p_cam)
        if lens_radius > 0.0:
            lx, ly = concentric_sample_disk(u_lens[:, 0], u_lens[:, 1])
            p_lens = lens_radius * jnp.stack([lx, ly], -1)
            ft = focal_distance / jnp.maximum(d_cam[:, 2], 1e-6)
            p_focus = o_cam + ft[:, None] * d_cam
            o_cam = jnp.concatenate([p_lens, jnp.zeros((n, 1))], -1)
            d_cam = normalize(p_focus - o_cam)
    o_w = _xform_point(cam_to_world, o_cam)
    d_w = normalize(_xform_vector(cam_to_world, d_cam))
    return o_w, d_w
