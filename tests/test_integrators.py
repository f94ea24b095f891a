"""Direct-lighting / Whitted / AO integrator tests (reference parity:
directlighting.cpp, whitted.cpp, ao.cpp)."""

import numpy as np

from tpupt.scene.loader import parse_string
from tpupt.scene.flatten import flatten
from tpupt.integrators.path import Renderer

_BASE = """
LookAt 0 0 5   0 0 0   0 1 0
Camera "perspective" "float fov" [30]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "random" "integer pixelsamples" [8]
Integrator "%s" %s
WorldBegin
LightSource "distant" "point from" [0 0 1] "point to" [0 0 0] "color L" [2 2 2]
Material "matte" "color Kd" [0.6 0.4 0.2]
Shape "trianglemesh" "point P" [ -50 -50 0  50 -50 0  50 50 0  -50 50 0 ]
    "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def _render(integ, params, spp=8):
    sc = flatten(parse_string(_BASE % (integ, params)))
    r = Renderer(sc)
    return r.image(r.render(spp=spp))


def test_direct_lighting_matches_analytic():
    kd = np.array([0.6, 0.4, 0.2])
    img = _render("directlighting", '"integer maxdepth" [2]')
    np.testing.assert_allclose(img.reshape(-1, 3).mean(0), kd / np.pi * 2,
                               rtol=0.02)


def test_whitted_matches_direct_on_diffuse():
    i1 = _render("whitted", '"integer maxdepth" [2]')
    i2 = _render("directlighting", '"integer maxdepth" [2]')
    np.testing.assert_allclose(i1, i2, atol=1e-5)


def test_ao_open_hemisphere_is_pi():
    # the reference's AO integrator returns the UNNORMALIZED visibility
    # integral: full visibility = integral of cos = pi (ao.cpp:99)
    img = _render("ambientocclusion", '"integer nsamples" [8]')
    np.testing.assert_allclose(img.reshape(-1, 3).mean(0), np.pi, rtol=0.02)


def test_direct_vs_path_single_bounce():
    # With maxdepth 1 for path (one NEE vertex) the estimates agree on a
    # purely diffuse, single-surface scene.
    i1 = _render("directlighting", '"integer maxdepth" [2]')
    i2 = _render("path", '"integer maxdepth" [1]')
    np.testing.assert_allclose(i1.mean((0, 1)), i2.mean((0, 1)), rtol=0.02)


def test_cat_scene_round_trips():
    """--cat emits statements that re-parse to the same scene (pbrt.cpp
    --cat); --toply swaps inline meshes for PLY sidecars that flatten to
    the same triangle count."""
    import io
    import os
    import tempfile
    import numpy as np
    from tpupt.scene.loader import parse_file, parse_string
    from tpupt.scene.flatten import flatten
    from tpupt.tools.catscene import cat_scene

    txt = """
LookAt 0 0 4   0 0 0   0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [12] "integer yresolution" [12]
Sampler "random" "integer pixelsamples" [2]
Integrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "point" "point from" [0 2 0] "color I" [5 5 5]
Material "matte" "color Kd" [0.4 0.5 0.6]
Shape "trianglemesh" "point P" [ -1 -1 0  1 -1 0  1 1 0  -1 1 0 ]
    "integer indices" [0 1 2 2 3 0]
Shape "sphere" "float radius" [0.5]
WorldEnd
"""
    desc = parse_string(txt)
    buf = io.StringIO()
    cat_scene(desc, buf)
    desc2 = parse_string(buf.getvalue())
    sc1 = flatten(desc)
    sc2 = flatten(desc2)
    assert sc1.triangles.count == sc2.triangles.count
    assert sc1.spheres.count == sc2.spheres.count
    assert sc1.lights.count == sc2.lights.count
    np.testing.assert_allclose(np.asarray(sc1.camera.cam_to_world),
                               np.asarray(sc2.camera.cam_to_world),
                               atol=1e-5)

    with tempfile.TemporaryDirectory() as td:
        buf2 = io.StringIO()
        n_ply = cat_scene(desc, buf2, to_ply=True, ply_dir=td)
        assert n_ply == 1 and os.path.exists(
            os.path.join(td, "mesh_00000.ply"))
        desc3 = parse_string(buf2.getvalue())
        sc3 = flatten(desc3, scene_dir=td)
        assert sc3.triangles.count == sc1.triangles.count
