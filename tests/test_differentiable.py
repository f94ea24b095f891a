"""Differentiable-rendering validation: reverse-mode gradients vs finite
differences (the BASELINE.json 'pixel-gradient allclose' north star,
detached-sampling estimator)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpupt.scene.loader import parse_string
from tpupt.scene.flatten import flatten
from tpupt.integrators.path import Renderer, path_li, pick_traversal

_SCENE = """
LookAt 0 0 5   0 0 0   0 1 0
Camera "perspective" "float fov" [30]
Film "image" "integer xresolution" [12] "integer yresolution" [12]
Sampler "random" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "distant" "point from" [0 0 1] "point to" [0 0 0] "color L" [2 2 2]
Material "matte" "color Kd" [0.5 0.5 0.5]
Shape "trianglemesh" "point P" [ -50 -50 0  50 -50 0  50 50 0  -50 50 0 ]
    "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def _mean_radiance(scene, r, kd_value, light_L):
    ds = r.ds._replace(
        mat_kd=jnp.full_like(r.ds.mat_kd, kd_value),
        light_L=jnp.full_like(r.ds.light_L, light_L))
    isect, isect_p = pick_traversal(r.st)
    n = int(r.px.shape[0])
    from tpupt.cameras.perspective import generate_rays

    jx, jy = r.sampler.camera_jitter(r.px, r.py, jnp.uint32(0))
    pr = jnp.stack([r.px.astype(jnp.float32) + jx,
                    r.py.astype(jnp.float32) + jy], -1)
    o, d = generate_rays(scene.camera.type, ds.raster_to_camera,
                         ds.cam_to_world, pr, jnp.zeros((n, 2)), 0.0, 1e6)
    L, _ = path_li(ds, r.st, r.sampler, scene.integrator.max_depth, 1.0,
                   r.px, r.py, jnp.uint32(0), o, d,
                   isect=isect, isect_p=isect_p)
    return jnp.mean(jnp.where(r.valid[:, None], L, 0.0))


def test_gradient_matches_finite_difference():
    scene = flatten(parse_string(_SCENE))
    r = Renderer(scene)

    f_kd = lambda kd: _mean_radiance(scene, r, kd, 2.0)
    g_kd = jax.grad(f_kd)(0.5)
    eps = 1e-3
    fd_kd = (f_kd(0.5 + eps) - f_kd(0.5 - eps)) / (2 * eps)
    # diffuse single-bounce: radiance linear in kd (plus small interreflection)
    np.testing.assert_allclose(float(g_kd), float(fd_kd), rtol=2e-2)
    assert float(g_kd) > 0.01  # dL/dKd > 0 (mean diluted by batch padding)

    f_L = lambda l: _mean_radiance(scene, r, 0.5, l)
    g_L = jax.grad(f_L)(2.0)
    fd_L = (f_L(2.0 + eps) - f_L(2.0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g_L), float(fd_L), rtol=2e-2)
    # radiance exactly linear in light emission
    np.testing.assert_allclose(float(g_L) * 2.0, float(f_L(2.0)), rtol=1e-3)


def test_gradients_finite_on_glossy_scene():
    txt = _SCENE.replace('Material "matte" "color Kd" [0.5 0.5 0.5]',
                         'Material "plastic" "color Kd" [.4 .3 .2] '
                         '"color Ks" [.3 .3 .3] "float roughness" [.1]')
    scene = flatten(parse_string(txt))
    r = Renderer(scene)
    g = jax.grad(lambda kd: _mean_radiance(scene, r, kd, 2.0))(0.4)
    assert np.isfinite(float(g))
