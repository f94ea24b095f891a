"""Goniometric/projection lights + spatial light distribution tests
(lights/goniometric.cpp, lights/projection.cpp, lightdistrib.cpp)."""

import numpy as np
import jax.numpy as jnp

from tpupt.scene.flatten import flatten
from tpupt.scene.loader import parse_string
from tpupt.scene.device import upload, _spatial_light_grid
from tpupt.lights.lights import sample_li


def _scene(light_stmt):
    return flatten(parse_string(f"""
LookAt 0 0 4  0 0 0  0 1 0
Camera "perspective"
Film "image" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
{light_stmt}
Shape "trianglemesh" "point P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""))


def test_goniometric_light_uniform_map_equals_point():
    """A gonio light with no map behaves as a point light."""
    sc = _scene('LightSource "goniometric" "rgb I" [2 2 2]')
    ds, st = upload(sc)
    assert st.has_light_imgs
    p = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    lid = jnp.zeros(2, jnp.int32)
    ls = sample_li(ds, st, lid, p, jnp.full(2, 0.3), jnp.full(2, 0.7))
    # I / d^2 with the all-ones 1x1 default map
    np.testing.assert_allclose(np.array(ls.li)[0], [2, 2, 2], rtol=1e-5)
    np.testing.assert_allclose(np.array(ls.li)[1], [0.5, 0.5, 0.5], rtol=1e-5)
    assert np.array(ls.is_delta).all()


def test_projection_light_frustum_cull():
    """Points outside the projection fov receive nothing."""
    sc = _scene('AttributeBegin\n'
                'LightSource "projection" "rgb I" [4 4 4] "float fov" [40]\n'
                'AttributeEnd')
    ds, st = upload(sc)
    # light sits at origin projecting along +z
    p_in = jnp.asarray([[0.0, 0.0, 2.0]])     # on the axis
    p_out = jnp.asarray([[2.0, 0.0, 0.1]])    # nearly sideways
    lid = jnp.zeros(1, jnp.int32)
    ls_in = sample_li(ds, st, lid, p_in, jnp.full(1, 0.5), jnp.full(1, 0.5))
    ls_out = sample_li(ds, st, lid, p_out, jnp.full(1, 0.5), jnp.full(1, 0.5))
    assert np.array(ls_in.li).max() > 0.5
    assert np.array(ls_out.li).max() == 0.0


def test_spatial_grid_prefers_near_lights():
    """Voxels near a light give it higher choice probability
    (SpatialLightDistribution semantics)."""
    sc = flatten(parse_string("""
LookAt 0 0 4  0 0 0  0 1 0
Camera "perspective"
Film "image" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
LightSource "point" "rgb I" [1 1 1] "point from" [-5 0 0]
LightSource "point" "rgb I" [1 1 1] "point from" [5 0 0]
Shape "trianglemesh" "point P" [-6 -1 0  6 -1 0  6 1 0  -6 1 0]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""))
    wlo, whi = sc.world_bounds()
    cdf = _spatial_light_grid(sc, sc.lights, wlo, whi)
    g = round(cdf.shape[0] ** (1 / 3))
    pmf = np.diff(np.concatenate([np.zeros((cdf.shape[0], 1)), cdf], 1), axis=1)
    grid = pmf.reshape(g, g, g, 2)
    # voxels at -x strongly prefer light 0; at +x, light 1
    assert grid[0, g // 2, g // 2, 0] > 0.9
    assert grid[-1, g // 2, g // 2, 1] > 0.9
    np.testing.assert_allclose(pmf.sum(-1), 1.0, atol=1e-5)


def test_spatial_strategy_render_unbiased():
    """Rendering with spatial vs uniform light selection converges to the
    same image (both are valid estimators of the same integral)."""
    from tpupt.integrators.path import Renderer

    scene_txt = """
LookAt 0 0 3  0 0 0  0 1 0
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "halton" "integer pixelsamples" [32]
Integrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "point" "rgb I" [3 3 3] "point from" [2 2 2]
LightSource "point" "rgb I" [0.3 0.3 0.3] "point from" [-2 1 2]
Material "matte" "rgb Kd" [0.6 0.6 0.6]
Shape "trianglemesh" "point P" [-2 -2 0  2 -2 0  2 2 0  -2 2 0]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""
    sc = flatten(parse_string(scene_txt))
    r_sp = Renderer(sc, light_strategy="spatial")
    r_un = Renderer(sc, light_strategy="uniform")
    img_sp = np.array(r_sp.image(r_sp.render(spp=32)))
    img_un = np.array(r_un.image(r_un.render(spp=32)))
    np.testing.assert_allclose(img_sp.mean(), img_un.mean(), rtol=0.05)
