"""Unified ShardedRenderer: the mesh path re-jits the base Renderer's own
step, so sharded rendering must agree with single-chip rendering exactly
(deterministic stateless samplers) across integrators, and the scaling
harness must emit a sane efficiency curve on the 8-virtual-device mesh."""

import dataclasses

import numpy as np
import jax
import pytest

from tpupt.scene.flatten import flatten
from tpupt.scene.loader import parse_string
from tpupt.integrators.path import Renderer
from tpupt.parallel.mesh import ShardedRenderer, make_mesh, scaling_curve

_SCENE = """
LookAt 0 1 4.5  0 1 0  0 1 0
Camera "perspective" "float fov" [55]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "halton" "integer pixelsamples" [2]
Integrator "$INT" "integer maxdepth" [3]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [6 6 6] "bool twosided" "true"
  Translate 0 1.98 0
  Shape "trianglemesh" "point P" [-0.5 0 -0.5  0.5 0 -0.5  0.5 0 0.5  -0.5 0 0.5]
    "integer indices" [0 2 1 0 3 2]
AttributeEnd
Material "matte" "rgb Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "point P" [-2 0 -2  2 0 -2  2 0 2  -2 0 2] "integer indices" [0 1 2 2 3 0]
Material "plastic" "rgb Kd" [0.3 0.3 0.6] "float roughness" [0.1]
Shape "sphere" "float radius" [0.6]
WorldEnd
"""


@pytest.mark.parametrize("integrator", [
    "path", pytest.param("bdpt", marks=pytest.mark.slow)])
def test_sharded_matches_single_chip(integrator):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    sc = flatten(parse_string(_SCENE.replace("$INT", integrator)))
    r = Renderer(sc)
    single = np.array(r.image(r.render(spp=2)))

    sr = ShardedRenderer(sc, make_mesh(jax.devices()[:8]))
    sharded = np.array(sr.image(sr.render(spp=2)))
    # identical sampling decisions -> near-identical images (float reduction
    # order differs across the mesh)
    np.testing.assert_allclose(sharded, single, atol=2e-3)


def test_scaling_curve_emits_efficiency():
    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    sc = flatten(parse_string(_SCENE.replace("$INT", "path")))
    curve = scaling_curve(sc, device_counts=[1, 4], spp=1)
    assert [c["n_devices"] for c in curve] == [1, 4]
    assert all(c["rays_per_s"] > 0 for c in curve)
    assert curve[0]["efficiency"] == 1.0


def test_sharded_carries_full_feature_matrix():
    """Crop windows + sample clamping ride through the sharded step (they
    live in the base step the mesh path re-jits)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    sc = flatten(parse_string(_SCENE.replace("$INT", "path")))
    sc = dataclasses.replace(
        sc, film=dataclasses.replace(sc.film, crop=(0.0, 0.5, 0.0, 1.0)))
    sr = ShardedRenderer(sc, make_mesh(jax.devices()[:8]))
    img = np.array(sr.image(sr.render(spp=1)))
    assert img[:, :12].max() > 0.0   # rendered half
    assert img[:, 13:].max() == 0.0  # cropped half black


def test_sharded_pads_awkward_mesh_sizes():
    """A mesh whose size doesn't divide the wavefront batch pads instead
    of asserting (3- or 6-device pods must just work)."""
    import jax
    from tpupt.parallel.mesh import ShardedRenderer, make_mesh

    devs = jax.devices()[:6]
    if len(devs) < 6:
        return  # needs the 8-virtual-device CPU harness
    import numpy as np
    from jax.sharding import Mesh

    scene = flatten(parse_string(_SCENE))
    mesh = Mesh(np.asarray(devs), ("rays",))
    sr = ShardedRenderer(scene, mesh)
    assert sr.batch % 6 == 0
    film = sr.render(spp=2)
    img = sr.image(film)
    assert np.isfinite(img).all() and img.mean() > 0
