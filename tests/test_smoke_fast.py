"""Fast-tier smoke coverage for every slow-tier family (VERDICT r4 #5).

The default CI tier must exercise every integrator and traversal backend
end-to-end so regressions in slow-tier-only code cannot ship unnoticed
(the r4 multichip NaN regression shipped through exactly that hole).
Each test here is a tiny-resolution, few-sample version of a slow-tier
test family: golden parity, bdpt, mlt, sppm, treelets/streamed, requeue.
Pattern: analytic_scenes.cpp:420-439's full cross-product instantiation,
shrunk to smoke scale.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpupt.integrators.path import Renderer
from tpupt.scene.flatten import flatten, with_resolution
from tpupt.scene.loader import parse_file, parse_string

SCENES = "/root/reference/scenes"

_SCENE = """
LookAt 0 0 4  0 0 0  0 1 0
Camera "perspective" "float fov" [50]
Film "image" "integer xresolution" [12] "integer yresolution" [12]
Sampler "halton" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [2]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "color L" [6 6 6]
  Translate 0 2.2 0
  Shape "trianglemesh" "point P" [-0.6 0 -0.6  0.6 0 -0.6  0.6 0 0.6  -0.6 0 0.6]
      "integer indices" [0 1 2 2 3 0]
AttributeEnd
Material "matte" "rgb Kd" [0.6 0.6 0.6]
Shape "sphere" "float radius" [0.8]
Shape "trianglemesh" "point P" [-4 -1 -4  4 -1 -4  4 -1 4  -4 -1 4]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


@pytest.fixture(scope="module")
def path_ref():
    sc = flatten(parse_string(_SCENE))
    r = Renderer(sc)
    return np.asarray(r.image(r.render(spp=12))), sc


def test_smoke_bdpt(path_ref):
    """bdpt end-to-end at smoke scale (slow family: test_bdpt)."""
    import dataclasses

    ip, sc = path_ref
    sc_b = dataclasses.replace(
        sc, integrator=dataclasses.replace(sc.integrator, name="bdpt"))
    r = Renderer(sc_b)
    im = np.asarray(r.image(r.render(spp=4)))
    assert np.isfinite(im).all()
    assert im.mean() > 1e-4
    # loose agreement with the path reference (8/16 spp on 12x12)
    np.testing.assert_allclose(im.mean(), ip.mean(), rtol=0.35)


def test_smoke_mlt(path_ref):
    """mlt end-to-end at smoke scale (slow family: test_mlt_sppm)."""
    from tpupt.integrators.mlt import MLTRenderer

    ip, sc = path_ref
    r = Renderer(sc)
    m = MLTRenderer(r, n_bootstrap=1024)
    im = m.render(mutations_per_pixel=4)
    assert np.isfinite(im).all()
    assert im.mean() > 1e-4
    np.testing.assert_allclose(im.mean(), ip.mean(), rtol=0.5)


def test_smoke_sppm(path_ref):
    """sppm end-to-end at smoke scale (slow family: test_mlt_sppm)."""
    from tpupt.integrators.sppm import SPPMRenderer

    ip, sc = path_ref
    r = Renderer(sc)
    s = SPPMRenderer(r, photons_per_iter=1024)
    im = s.render(n_iterations=1)
    assert np.isfinite(im).all()
    assert im.mean() > 1e-4


def _cluster_upload(n_tris=400, n_clusters=8, seed=0):
    from tpupt.scene.device import upload

    rng = np.random.default_rng(seed)
    centers = rng.uniform(-8, 8, (n_clusters, 3))
    ci = rng.integers(0, n_clusters, n_tris)
    base = centers[ci] + rng.normal(0, 0.5, (n_tris, 3))
    e1 = rng.normal(0, 0.3, (n_tris, 3))
    e2 = rng.normal(0, 0.3, (n_tris, 3))
    pts = np.concatenate([base, base + e1, base + e2], axis=1).reshape(-1)
    idx = np.arange(3 * n_tris)
    p_str = " ".join(f"{v:.5f}" for v in pts)
    i_str = " ".join(str(i) for i in idx)
    txt = f"""
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Integrator "path"
WorldBegin
Material "matte" "rgb Kd" [0.5 0.5 0.5]
Shape "trianglemesh" "point P" [{p_str}] "integer indices" [{i_str}]
WorldEnd
"""
    return upload(flatten(parse_string(txt)), two_level=True,
                  treelet_budget=(32, 256))


@pytest.fixture(scope="module")
def two_level_small():
    ds, st = _cluster_upload()
    assert st.two_level and st.n_treelets >= 2
    return ds, st


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.full(n, jnp.inf)


def test_smoke_streamed_traversal(two_level_small):
    """Two-level streamed kernel vs XLA walker, interpret mode (slow
    family: test_treelets)."""
    from tpupt.accel import traverse as trav
    from tpupt.ops.traverse_stream import intersect_packets_streamed

    ds, st = two_level_small
    o, d, tmax = _rays(128)
    hit_s, _ = intersect_packets_streamed(ds, st, o, d, tmax, interpret=True)
    hit_w, _ = trav.intersect_wide(ds, st, o, d, tmax)
    assert bool(jnp.any(hit_w.valid))
    np.testing.assert_array_equal(np.asarray(hit_s.valid),
                                  np.asarray(hit_w.valid))
    v = np.asarray(hit_w.valid)
    np.testing.assert_allclose(np.asarray(hit_s.t)[v],
                               np.asarray(hit_w.t)[v], rtol=2e-4, atol=1e-5)


def test_smoke_requeue_traversal(two_level_small):
    """Treelet-major re-queue kernel vs XLA walker, interpret mode (slow
    family: test_treelets requeue block)."""
    from tpupt.accel import traverse as trav
    from tpupt.ops.traverse_requeue import intersect_packets_requeue

    ds, st = two_level_small
    o, d, tmax = _rays(128, seed=3)
    hit_r, _ = intersect_packets_requeue(ds, st, o, d, tmax, interpret=True)
    hit_w, _ = trav.intersect_wide(ds, st, o, d, tmax)
    assert bool(jnp.any(hit_w.valid))
    np.testing.assert_array_equal(np.asarray(hit_r.valid),
                                  np.asarray(hit_w.valid))
    v = np.asarray(hit_w.valid)
    np.testing.assert_allclose(np.asarray(hit_r.t)[v],
                               np.asarray(hit_w.t)[v], rtol=2e-4, atol=1e-5)


def test_smoke_golden_dodecahedron():
    """Golden-image parity at 1/8 res, 2 spp (slow family: test_golden;
    quarter-res 8 spp measured sRGB MAE 0.0006 / corr 0.999)."""
    from tpupt.utils.imageio import linear_to_srgb, read_png

    scene = flatten(parse_file(os.path.join(SCENES, "dodecahedron")), SCENES)
    f = 8
    xres, yres = scene.film.xres // f, scene.film.yres // f
    scene = with_resolution(scene, xres, yres)
    r = Renderer(scene)
    ours = np.asarray(r.image(r.render(spp=2)))
    ref = read_png(os.path.join(SCENES, "dodecahedron.png"))
    h, w = ref.shape[:2]
    ref = ref[: h // f * f, : w // f * f].reshape(
        h // f, f, w // f, f, 3).mean((1, 3))[:yres, :xres]
    a = linear_to_srgb(ours)
    b = linear_to_srgb(np.clip(ref, 0.0, 1.0))
    mae = float(np.abs(a - b).mean())
    av, bv = a - a.mean(), b - b.mean()
    corr = float((av * bv).sum()
                 / max(np.sqrt((av * av).sum() * (bv * bv).sum()), 1e-12))
    assert mae < 0.06, mae
    assert corr > 0.9, corr
