"""Texture system tests (src/textures/ parity subset)."""

import pytest
import numpy as np
import jax.numpy as jnp

from tpupt.scene.loader import parse_string
from tpupt.scene.flatten import flatten
from tpupt.integrators.path import Renderer
from tpupt.textures.textures import perlin, fbm


def test_perlin_range_and_smoothness():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(4096, 3)).astype(np.float32) * 10)
    v = np.array(perlin(p))
    assert np.abs(v).max() <= 1.5  # gradient noise stays bounded
    assert v.std() > 0.05          # non-degenerate
    # continuity: tiny perturbation -> tiny change
    v2 = np.array(perlin(p + 1e-4))
    assert np.abs(v - v2).max() < 1e-2


def test_fbm_accumulates_octaves():
    p = jnp.asarray(np.random.default_rng(1).normal(size=(512, 3)) * 5,
                    dtype=jnp.float32)
    v1 = np.array(fbm(p, 0.5, 1))
    v4 = np.array(fbm(p, 0.5, 4))
    assert v4.std() > v1.std() * 0.9  # more octaves, more detail


@pytest.mark.slow
def test_checkerboard_texture_renders():
    img = _render_tex("""
    Texture "check" "color" "checkerboard"
        "color tex1" [1 0 0] "color tex2" [0 0 1]
        "float uscale" [4] "float vscale" [4]
    Material "matte" "texture Kd" "check"
    """)
    # both colors must appear
    reds = (img[..., 0] > img[..., 2]).mean()
    blues = (img[..., 2] > img[..., 0]).mean()
    assert 0.2 < reds < 0.8 and 0.2 < blues < 0.8


def test_constant_texture_folds():
    img_t = _render_tex("""
    Texture "k" "color" "constant" "color value" [0.2 0.4 0.6]
    Material "matte" "texture Kd" "k"
    """)
    img_c = _render_tex('Material "matte" "color Kd" [0.2 0.4 0.6]')
    np.testing.assert_allclose(img_t, img_c, atol=1e-5)


@pytest.mark.slow
def test_scale_texture():
    img_t = _render_tex("""
    Texture "base" "color" "constant" "color value" [0.5 0.5 0.5]
    Texture "k" "color" "scale" "texture tex1" "base" "color tex2" [1 0.5 0.25]
    Material "matte" "texture Kd" "k"
    """)
    img_c = _render_tex('Material "matte" "color Kd" [0.5 0.25 0.125]')
    np.testing.assert_allclose(img_t, img_c, atol=1e-4)


def _render_tex(mat_block, spp=4):
    txt = f"""
    LookAt 0 0 5   0 0 0   0 1 0
    Camera "perspective" "float fov" [30]
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "random" "integer pixelsamples" [4]
    Integrator "path" "integer maxdepth" [1]
    WorldBegin
    LightSource "distant" "point from" [0 0 1] "point to" [0 0 0]
        "color L" [3.14159265 3.14159265 3.14159265]
    {mat_block}
    Shape "trianglemesh" "point P" [ -50 -50 0  50 -50 0  50 50 0  -50 50 0 ]
        "float uv" [0 0  1 0  1 1  0 1]
        "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """
    sc = flatten(parse_string(txt))
    r = Renderer(sc)
    return r.image(r.render(spp=spp))


def test_env_map_infinite_light(tmp_path):
    # top hemisphere bright, bottom dark: a plane should be lit ~only by
    # the bright half; escaped rays must see the map
    from tpupt.utils.imageio import write_pfm

    h, w = 16, 32
    env = np.zeros((h, w, 3), np.float32)
    # phi < pi half (u < 0.5) bright: for a -z-facing camera with +y up,
    # that's directions with dy > 0 -> the TOP half of the image
    env[:, : w // 2] = [2.0, 1.0, 0.5]
    write_pfm(str(tmp_path / "env.pfm"), env)
    txt = f"""
    LookAt 0 0 2   0 0 0   0 1 0
    Camera "perspective" "float fov" [60]
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
    Sampler "random" "integer pixelsamples" [16]
    Integrator "path" "integer maxdepth" [2]
    WorldBegin
    LightSource "infinite" "string mapname" "{tmp_path}/env.pfm"
    WorldEnd
    """
    sc = flatten(parse_string(txt, search_dir=str(tmp_path)))
    assert sc.env_map is not None
    r = Renderer(sc)
    img = r.image(r.render(spp=8))
    # camera looks horizontally: upper half of image sees bright sky
    top = img[:6].mean(0).mean(0)
    bottom = img[10:].mean(0).mean(0)
    np.testing.assert_allclose(top, [2.0, 1.0, 0.5], rtol=0.05)
    np.testing.assert_allclose(bottom, 0.0, atol=1e-5)


def test_mipmap_trilinear_selection(tmp_path):
    """Wide footprints read coarse mip levels (MIPMap::Lookup, mipmap.h):
    width -> 1 collapses a checker image to its average."""
    import numpy as np
    import jax.numpy as jnp
    from tpupt.utils import imageio
    from tpupt.textures.textures import TextureTable, eval_texture
    from tpupt.scene.api import TextureDef
    from tpupt.scene.params import ParamSet

    img = (np.indices((16, 16)) // 4).sum(0) % 2  # 4-texel checker
    rgb = np.repeat(img[:, :, None], 3, -1).astype(np.float32)
    p = tmp_path / "checker.pfm"
    imageio.write_pfm(str(p), rgb)
    ps = ParamSet()
    ps.add("string filename", [str(p)])
    tbl = TextureTable()
    from tpupt.core.transforms import Transform

    tbl._add("t", TextureDef("tex", "spectrum", "imagemap", ps,
                             Transform()), {}, str(tmp_path))
    tx = {k: jnp.asarray(v) for k, v in tbl.arrays().items()}
    n = 64
    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))
    pw = jnp.zeros((n, 3))
    tid = jnp.zeros(n, jnp.int32)
    # coarse: full-image footprint -> ~0.5 everywhere (checker average)
    coarse = np.array(eval_texture(tx, tid, uv, pw, width=jnp.ones(n)))
    np.testing.assert_allclose(coarse, 0.5, atol=0.05)
    # fine: sub-texel footprint -> binary checker values
    fine = np.array(eval_texture(tx, tid, uv, pw,
                                 width=jnp.full(n, 1e-6)))
    assert fine.std() > 0.2


def test_ewa_anisotropic_beats_trilinear(tmp_path):
    """EWA-style anisotropic taps average along the footprint's major axis
    only (mipmap.h EWA): for a vertically-striped texture and a footprint
    elongated along u, aniso lookups approach the stripe average while
    trilinear at the (sharp) minor width still resolves the stripes."""
    from tpupt.utils import imageio
    from tpupt.textures.textures import TextureTable, eval_texture
    from tpupt.scene.api import TextureDef
    from tpupt.scene.params import ParamSet
    from tpupt.core.transforms import Transform

    stripes = (np.indices((64, 64))[1] // 4) % 2  # vertical stripes (u)
    rgb = np.repeat(stripes[:, :, None], 3, -1).astype(np.float32)
    p = tmp_path / "stripes.pfm"
    imageio.write_pfm(str(p), rgb)
    ps = ParamSet()
    ps.add("string filename", [str(p)])
    tbl = TextureTable()
    tbl._add("t", TextureDef("tex", "spectrum", "imagemap", ps,
                             Transform()), {}, str(tmp_path))
    tx = {k: jnp.asarray(v) for k, v in tbl.arrays().items()}
    n = 128
    rng = np.random.default_rng(3)
    uv = jnp.asarray(rng.uniform(0.2, 0.8, (n, 2)).astype(np.float32))
    pw = jnp.zeros((n, 3))
    tid = jnp.zeros(n, jnp.int32)
    w_minor = jnp.full(n, 1.0 / 64.0)  # one-texel minor width (sharp)
    major_u = jnp.tile(jnp.asarray([[0.25, 0.0]]), (n, 1))  # 16 texels in u
    tri = np.array(eval_texture(tx, tid, uv, pw, width=w_minor))
    ewa = np.array(eval_texture(tx, tid, uv, pw, width=w_minor,
                                aniso=major_u))
    # trilinear keeps hard stripes (values near 0/1); EWA averages them
    assert np.abs(ewa - 0.5).mean() < np.abs(tri - 0.5).mean() * 0.6
    # an elongation along v must NOT blur the u stripes
    major_v = jnp.tile(jnp.asarray([[0.0, 0.25]]), (n, 1))
    ewa_v = np.array(eval_texture(tx, tid, uv, pw, width=w_minor,
                                  aniso=major_v))
    np.testing.assert_allclose(ewa_v, tri, atol=0.02)


def test_checkerboard_aa_closed_form():
    """The closed-form box-filter checker (checkerboard.h:116 ClosedForm,
    the pbrt aamode default): a footprint spanning full periods integrates
    to the 0.5 blend; point sampling stays binary."""
    from tpupt.textures.textures import TextureTable, eval_texture
    from tpupt.scene.api import TextureDef
    from tpupt.scene.params import ParamSet
    from tpupt.core.transforms import Transform

    ps = ParamSet()
    ps.add("color tex1", [1.0, 1.0, 1.0])
    ps.add("color tex2", [0.0, 0.0, 0.0])
    tbl = TextureTable()
    tbl._add("c", TextureDef("c", "spectrum", "checkerboard", ps,
                             Transform()), {}, ".")
    tx = {k: jnp.asarray(v) for k, v in tbl.arrays().items()}
    n = 64
    rng = np.random.default_rng(0)
    # cell-interior points (>= 0.1 from any edge): a small footprint there
    # must match the point sample exactly
    uv = jnp.asarray(rng.integers(0, 8, (n, 2))
                     + 0.1 + 0.8 * rng.random((n, 2)), dtype=jnp.float32)
    tid = jnp.zeros(n, jnp.int32)
    pw = jnp.zeros((n, 3))
    # footprint = one full period (2 checker cells): integral is exactly 0.5
    wide = np.array(eval_texture(tx, tid, uv, pw, width=jnp.full(n, 1.0)))
    np.testing.assert_allclose(wide, 0.5, atol=1e-5)
    # small footprint inside a cell: converges to the binary checker
    sharp = np.array(eval_texture(tx, tid, uv, pw,
                                  width=jnp.full(n, 1e-3)))
    point = np.array(eval_texture(tx, tid, uv, pw))
    np.testing.assert_allclose(sharp, point, atol=1e-2)


def test_checkerboard_3d_solid():
    """dimension=3 checker uses world-space parity independent of uv
    (Checkerboard3DTexture, checkerboard.h:250)."""
    from tpupt.textures.textures import TextureTable, eval_texture
    from tpupt.scene.api import TextureDef
    from tpupt.scene.params import ParamSet
    from tpupt.core.transforms import Transform

    ps = ParamSet()
    ps.add("integer dimension", [3])
    ps.add("color tex1", [1.0, 1.0, 1.0])
    ps.add("color tex2", [0.0, 0.0, 0.0])
    tbl = TextureTable()
    tbl._add("c3", TextureDef("c3", "spectrum", "checkerboard", ps,
                              Transform()), {}, ".")
    tx = {k: jnp.asarray(v) for k, v in tbl.arrays().items()}
    uv = jnp.zeros((4, 2))
    tid = jnp.zeros(4, jnp.int32)
    pw = jnp.asarray([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5],
                      [1.5, 1.5, 0.5], [0.5, 0.5, -0.5]], jnp.float32)
    out = np.array(eval_texture(tx, tid, uv, pw))[:, 0]
    np.testing.assert_allclose(out, [1.0, 0.0, 1.0, 0.0])


def test_hosek_sky_model(tmp_path):
    """Hosek-Wilkie makesky (imgtool.cpp:87 parity via the published RGB
    dataset): blue-dominant upper sky, warm peak toward the sun, energy
    rising toward the horizon-sun direction."""
    from tpupt.tools.imgtool import main as imgtool_main
    from tpupt.utils import imageio
    import os
    from tpupt.tools import imgtool as _it

    if not os.path.exists(os.path.join(os.path.dirname(_it.__file__),
                                       "hosek_data.npz")):
        import pytest
        pytest.skip("hosek dataset not generated")
    out = str(tmp_path / "sky.pfm")
    imgtool_main(["makesky", "--elevation", "20", "--turbidity", "4",
                  "--resolution", "32", out])
    img = imageio.read_pfm(out)
    assert np.isfinite(img).all() and img.max() > 0
    upper = img[:12]
    assert (upper[..., 2] > upper[..., 0]).mean() > 0.8  # blue sky
    # the brightest sky direction is near the sun azimuth (phi ~ 0)
    lum = img[..., :3].mean(-1)
    iy, ix = np.unravel_index(np.argmax(lum), lum.shape)
    assert ix < 4 or ix > 60  # sun sits at phi=0 (wrap)
