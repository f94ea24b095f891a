"""Per-ray-time motion blur (AnimatedTransform parity, transform.cpp:1144):
vertex-lerp motion through the wavefront traversal + per-ray camera slerp.

Pattern: analytic coverage fractions — a translating emissive quad's pixel
value equals L x (fraction of the shutter the quad covers that pixel)."""

import numpy as np
import jax.numpy as jnp

from tpupt.scene.flatten import flatten
from tpupt.scene.loader import parse_string
from tpupt.integrators.path import Renderer

_MOVING = """
LookAt 0 0 5  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "halton" "integer pixelsamples" [64]
Integrator "path" "integer maxdepth" [1]
WorldBegin
AttributeBegin
  ActiveTransform EndTime
  Translate 0.8 0 0
  ActiveTransform All
  AreaLightSource "diffuse" "rgb L" [5 5 5]
  Shape "trianglemesh" "point P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
    "integer indices" [0 1 2 2 3 0]
AttributeEnd
WorldEnd
"""

_STATIC = _MOVING.replace('  ActiveTransform EndTime\n  Translate 0.8 0 0\n'
                          '  ActiveTransform All\n', '')


def _img(txt, spp=64):
    sc = flatten(parse_string(txt))
    r = Renderer(sc)
    return np.array(r.image(r.render(spp=spp))), r


def test_translating_quad_blur_matches_coverage():
    im_m, rm = _img(_MOVING)
    im_s, _ = _img(_STATIC)
    assert rm.st.has_motion
    assert np.isfinite(im_m).all()
    # the images must actually differ (blur happened)
    assert np.abs(im_m - im_s).max() > 0.5
    # energy invariant: a translation that keeps the quad inside the frame
    # preserves total energy (integral of coverage over x = quad width)
    np.testing.assert_allclose(im_m.mean(), im_s.mean(), rtol=0.05)
    # coverage fractions: the quad spans x in [-1,1] moving to [-0.2,1.8];
    # a pixel at |x| = 1.4 is covered for exactly half the shutter on the
    # leading edge and never on the trailing edge (flip-agnostic: check the
    # pair). Fully covered reference value from the static image center.
    hw = 5.0 * np.tan(np.deg2rad(20.0))
    row = 16

    def px_of(x):
        return int(round(16 + x / hw * 16))

    full = im_s[row, 16].mean()  # quad radiance when fully covered
    lead = im_m[row, px_of(1.4)].mean()
    trail = im_m[row, px_of(-1.4)].mean()
    cov = sorted([lead / full, trail / full])
    assert cov[0] < 0.08          # off-side pixel: (almost) never covered
    assert 0.35 < cov[1] < 0.65   # leading pixel: ~half the shutter


def test_motion_traversal_backends_agree():
    """Wide BVH (shutter-union node bounds + per-prim lerp) == brute force
    for random motion deltas and random per-ray times."""
    from tpupt.accel.traverse import intersect_brute, intersect_wide

    sc = flatten(parse_string(_MOVING))
    r = Renderer(sc)
    rng = np.random.default_rng(3)
    n = 256
    o = jnp.asarray(rng.normal(0, 2.5, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tm = jnp.asarray(rng.random(n, np.float32))
    tmax = jnp.full(n, np.inf)
    hw, _ = intersect_wide(r.ds, r.st, o, d, tmax, time=tm)
    hb = intersect_brute(r.ds, r.st, o, d, tmax, time=tm)
    np.testing.assert_array_equal(np.array(hw.valid), np.array(hb.valid))
    np.testing.assert_allclose(np.array(hw.t)[np.array(hb.valid)],
                               np.array(hb.t)[np.array(hb.valid)],
                               rtol=1e-4)


_CAM_MOVE = """
ActiveTransform StartTime
LookAt -0.4 0 5  -0.4 0 0  0 1 0
ActiveTransform EndTime
LookAt 0.4 0 5  0.4 0 0  0 1 0
ActiveTransform All
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "halton" "integer pixelsamples" [64]
Integrator "path" "integer maxdepth" [1]
WorldBegin
AreaLightSource "diffuse" "rgb L" [5 5 5]
Shape "trianglemesh" "point P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def test_animated_camera_blurs():
    """A translating camera over a static emissive quad: edges smear, and
    total energy stays within the frame (camera pans < frame margin)."""
    im_m, rm = _img(_CAM_MOVE)
    assert rm.st.cam_animated
    im_s, _ = _img(_CAM_MOVE.replace("-0.4 0 5  -0.4 0 0", "0.4 0 5  0.4 0 0"))
    assert np.isfinite(im_m).all()
    assert np.abs(im_m - im_s).max() > 0.5  # blurred vs end-frame render
    # edge pixels see partial coverage: values strictly between 0 and full
    row = im_m[16]
    full = row.max()
    partial = (row.mean(-1) > 0.1 * full) & (row.mean(-1) < 0.9 * full)
    assert partial.sum() >= 2
