"""Ptex codec + per-face texture evaluation (textures/ptex.{h,cpp} parity:
faceIndex-addressed textures; the codec itself replaces the ext/ptex
submodule the same way utils/imageio.py replaces OpenEXR)."""

import os

import numpy as np
import pytest

from tpupt.textures.ptex import (DT_FLOAT, DT_HALF, DT_UINT8, DT_UINT16,
                                 MT_QUAD, read_ptex, write_ptex)


def _rand_faces(rng, n, c=3):
    faces = []
    for _ in range(n):
        ru = 1 << rng.integers(0, 5)
        rv = 1 << rng.integers(0, 5)
        faces.append(rng.random((rv, ru, c)).astype(np.float32))
    return faces


@pytest.mark.parametrize("dt,atol", [(DT_UINT8, 1.0 / 255),
                                     (DT_UINT16, 1.0 / 65535),
                                     (DT_HALF, 1e-3), (DT_FLOAT, 0.0)])
def test_roundtrip_datatypes(tmp_path, dt, atol):
    rng = np.random.default_rng(7)
    faces = _rand_faces(rng, 6)
    path = os.path.join(tmp_path, "t.ptx")
    write_ptex(path, faces, datatype=dt)
    out, mesh = read_ptex(path)
    assert mesh == MT_QUAD and len(out) == len(faces)
    for a, b in zip(faces, out):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=atol + 1e-7)


def test_constant_faces_and_single_channel(tmp_path):
    faces = [np.full((4, 4, 1), 0.25, np.float32),
             np.full((1, 1, 1), 0.75, np.float32)]
    path = os.path.join(tmp_path, "c.ptx")
    write_ptex(path, faces, datatype=DT_FLOAT)
    out, _ = read_ptex(path)
    np.testing.assert_allclose(out[0], faces[0])
    np.testing.assert_allclose(out[1], faces[1])


def test_tiled_encoding(tmp_path):
    rng = np.random.default_rng(3)
    faces = [rng.random((16, 16, 3)).astype(np.float32),
             rng.random((8, 32, 3)).astype(np.float32)]
    path = os.path.join(tmp_path, "tiled.ptx")
    write_ptex(path, faces, datatype=DT_FLOAT, tile=4)
    out, _ = read_ptex(path)
    for a, b in zip(faces, out):
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_render_per_face_colors(tmp_path):
    """Two triangles with faceIndices [0, 1] and a 2-face ptex (red/blue):
    each triangle must shade with its own face color (PtexTexture::Evaluate
    reads si.faceIndex, ptex.cpp:154)."""
    import jax.numpy as jnp

    from tpupt.integrators.path import Renderer, shading_point
    from tpupt.materials.bsdf import gather_mat_params
    from tpupt.scene.flatten import flatten
    from tpupt.scene.loader import parse_string

    ptx = os.path.join(tmp_path, "faces.ptx")
    write_ptex(ptx, [np.full((8, 8, 3), [1.0, 0.0, 0.0], np.float32),
                     np.full((8, 8, 3), [0.0, 0.0, 1.0], np.float32)],
               datatype=DT_FLOAT)
    scene_txt = f"""
    LookAt 0 0 3  0 0 0  0 1 0
    Camera "perspective" "float fov" [60]
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Integrator "path" "integer maxdepth" [1]
    WorldBegin
    Texture "fc" "color" "ptex" "string filename" ["{ptx}"]
        "float gamma" [1]
    Material "matte" "texture Kd" "fc"
    Shape "trianglemesh"
        "point P" [-1 -1 0   1 -1 0   1 1 0   -1 1 0]
        "integer indices" [0 1 2  0 2 3]
        "integer faceIndices" [0 1]
    WorldEnd
    """
    scene = flatten(parse_string(scene_txt), str(tmp_path))
    r = Renderer(scene)
    ds, st = r.ds, r.st

    # direct table check through the real hit -> shading -> texture path
    o = jnp.asarray([[0.5, -0.5, 3.0], [-0.5, 0.5, 3.0]])  # tri0 / tri1
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    from tpupt.integrators.path import pick_traversal

    isect, _ = pick_traversal(st, with_stats=False)
    hit, _ = isect(ds, st, o, d, jnp.full(2, 1e6))
    assert bool(hit.valid.all())
    sp = shading_point(ds, st, hit, o, d)
    assert int(sp.face[0]) == 0 and int(sp.face[1]) == 1
    mp = gather_mat_params(ds, sp.mat, uv=sp.uv, p=sp.p, face=sp.face,
                           has_textures=st.has_textures)
    kd = np.asarray(mp.kd)
    assert kd[0, 0] > 0.9 and kd[0, 2] < 0.1, kd[0]  # red face
    assert kd[1, 2] > 0.9 and kd[1, 0] < 0.1, kd[1]  # blue face
