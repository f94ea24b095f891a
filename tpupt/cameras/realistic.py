"""Realistic (lens-system) camera — counterpart of cameras/realistic.cpp.

The reference traces each camera ray through a stack of spherical lens
elements read from a lens description file (rows: curvature-radius,
thickness, ior, aperture-diameter; measured in mm, scaled to meters), with
paraxial thick-lens focusing and exit-pupil sampling
(realistic.cpp:36-280). The TPU version traces the whole wavefront through
the element stack in lockstep — the per-element loop is a STATIC unroll
(element count is small and fixed), every lane refracts simultaneously,
and vignetted lanes carry weight 0 (their radiance is masked, which IS the
physical cat's-eye vignetting).

Lens space here: film plane at z = 0, scene toward -z; element vertex
positions accumulate rear-to-front. Exiting rays are flipped into camera
space (+z toward the scene) like TraceLensesFromFilm's z-negation
(realistic.cpp:182-229).
"""

from __future__ import annotations

import warnings

import numpy as np
import jax.numpy as jnp


def load_lens_file(path: str) -> np.ndarray:
    """Rows: curvature radius, thickness, eta, aperture diameter (mm);
    returns (E,4) in meters (realistic.cpp:42-55)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if not line:
                continue
            vals = [float(v) for v in line.split()]
            if len(vals) >= 4:
                rows.append(vals[:4])
    lens = np.asarray(rows, np.float64)
    lens[:, 0] *= 1e-3  # radius
    lens[:, 1] *= 1e-3  # thickness
    lens[:, 3] *= 1e-3 * 0.5  # aperture diameter -> radius
    return lens


def _paraxial_system_matrix(lens):
    """2x2 ray-transfer matrix of the stack, front to rear (scene->film)."""
    m = np.eye(2)
    n_prev = 1.0
    for i in range(len(lens)):
        r, t, eta, _ = lens[i]
        n_next = eta if eta != 0 else 1.0
        if r != 0:
            power = (n_next - n_prev) / r
            m = np.array([[1.0, 0.0], [-power, 1.0]]) @ m
        m = np.array([[1.0, t], [0.0, 1.0]]) @ m
        n_prev = n_next
    return m


def focus_thick_lens(lens, focus_distance):
    """Adjust the rear gap (last thickness) so objects at focus_distance
    image onto the film (FocusThickLens, realistic.cpp:258-280) — done with
    the paraxial transfer matrix instead of traced cardinal points."""
    lens = lens.copy()
    base = lens[-1, 1]

    def film_blur(gap):
        lens[-1, 1] = gap
        # paraxial ray from an on-axis object point at the focus distance
        # (front vertex at z_front): height 0, slope u
        m = _paraxial_system_matrix(lens)
        # object at distance D in front of the front vertex: propagate
        # [[1,D],[0,1]] then the system; want height 0 at film for any u
        d_obj = focus_distance
        full = m @ np.array([[1.0, d_obj], [0.0, 1.0]])
        return full[0, 1]  # x_film = full[0,1] * u  -> want 0

    lo, hi = base * 0.2, base * 5.0 + 0.1
    flo, fhi = film_blur(lo), film_blur(hi)
    if flo * fhi > 0:
        return lens  # cannot focus at that distance: keep the file's gap
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        fm = film_blur(mid)
        if flo * fm <= 0:
            hi = mid
        else:
            lo, flo = mid, fm
    lens[-1, 1] = 0.5 * (lo + hi)
    return lens


def element_z_positions(lens):
    """Vertex z of each interface in lens space (film at 0, scene at -z):
    z_i = -(sum of thicknesses from the interface to the film)."""
    z = np.zeros(len(lens))
    acc = 0.0
    for i in range(len(lens) - 1, -1, -1):
        acc += lens[i, 1]
        z[i] = -acc
    return z


def trace_lenses_from_film(lens, zpos, o, d):
    """Batched TraceLensesFromFilm (realistic.cpp:182-229). o/d in lens
    space; returns (o, d, alive)."""
    n = o.shape[0]
    alive = jnp.ones(n, bool)
    for i in range(len(lens) - 1, -1, -1):
        r, _, eta, ap = (float(lens[i, 0]), float(lens[i, 1]),
                         float(lens[i, 2]), float(lens[i, 3]))
        # row eta = IOR of the medium on the FILM side of interface i
        # (realistic.cpp:201-205): from film we cross i's medium -> i-1's
        eta_i = eta if eta != 0 else 1.0
        eta_t = (float(lens[i - 1, 2])
                 if i > 0 and lens[i - 1, 2] != 0 else 1.0)
        z_e = float(zpos[i])
        if r == 0.0:
            # aperture stop: plane intersection
            t = (z_e - o[:, 2]) / jnp.where(jnp.abs(d[:, 2]) < 1e-12,
                                            1e-12, d[:, 2])
            p = o + t[:, None] * d
            alive = alive & (t > 0) & (p[:, 0] ** 2 + p[:, 1] ** 2
                                       <= ap * ap)
            o = p
            continue
        # spherical interface: center on the axis at z_e + r
        zc = z_e + r
        oc = o - jnp.asarray([0.0, 0.0, zc])
        b = jnp.sum(oc * d, -1)
        c = jnp.sum(oc * oc, -1) - r * r
        disc = b * b - c
        ok = disc >= 0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        # pick the sheet nearest the interface VERTEX (the physical lens
        # surface; IntersectSphericalElement's closer/farther choice,
        # realistic.cpp:158-170, expressed side-independently)
        t1 = -b - sq
        t2 = -b + sq
        z1 = jnp.abs(o[:, 2] + t1 * d[:, 2] - z_e)
        z2 = jnp.abs(o[:, 2] + t2 * d[:, 2] - z_e)
        pick1 = (z1 <= z2) & (t1 > 1e-9) | (t2 <= 1e-9)
        t = jnp.where(pick1, t1, t2)
        p = o + t[:, None] * d
        alive = alive & ok & (t > 0) & (p[:, 0] ** 2 + p[:, 1] ** 2
                                        <= ap * ap)
        nrm = (p - jnp.asarray([0.0, 0.0, zc])) / r
        # orient against the incoming direction
        nrm = jnp.where((jnp.sum(nrm * d, -1) > 0)[:, None], -nrm, nrm)
        ratio = eta_i / eta_t
        cos_i = -jnp.sum(nrm * d, -1)
        sin2_t = ratio * ratio * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
        tir = sin2_t >= 1.0
        cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
        d_new = ratio * d + (ratio * cos_i - cos_t)[:, None] * nrm
        d_len = jnp.sqrt(jnp.maximum(jnp.sum(d_new * d_new, -1), 1e-20))
        d = jnp.where(tir[:, None], d, d_new / d_len[:, None])
        alive = alive & ~tir
        o = p
    return o, d, alive


def bound_exit_pupil(lens, zpos, film_diag, n_bins: int = 64,
                     n_side: int = 64):
    """Per-film-radius exit-pupil bounding boxes on the rear element plane
    (BoundExitPupil, realistic.cpp:231-256): for each of n_bins radial
    segments, trace a grid of candidate rays from sample film points to a
    1.5x-rear-radius square and bound the (x, y) of those that traverse
    the whole stack. Returns (n_bins, 4) [x0, y0, x1, y1] in meters,
    expanded by the grid spacing. Bins with no passing ray fall back to
    the full rear square (degenerate off-corner radii)."""
    rear_r = float(lens[-1, 3])
    rear_z = float(zpos[-1])
    r_max = film_diag / 2.0
    half = 1.5 * rear_r
    side = np.linspace(-half, half, n_side)
    gx, gy = np.meshgrid(side, side, indexing="ij")
    gx, gy = gx.ravel(), gy.ravel()
    m = gx.size
    out = np.zeros((n_bins, 4), np.float32)
    spacing = 2.0 * half / (n_side - 1)
    for b in range(n_bins):
        # several film x positions inside the segment (pbrt samples the
        # segment; 4 deterministic offsets cover it)
        boxes = []
        for fr in (0.125, 0.375, 0.625, 0.875):
            fx = (b + fr) / n_bins * r_max
            o = jnp.asarray(np.stack([np.full(m, fx), np.zeros(m),
                                      np.zeros(m)], -1), jnp.float32)
            pr = np.stack([gx, gy, np.full(m, rear_z)], -1)
            d = jnp.asarray(pr, jnp.float32) - o
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            _, _, alive = trace_lenses_from_film(lens, zpos, o, d)
            a = np.asarray(alive)
            if a.any():
                boxes.append((gx[a].min(), gy[a].min(),
                              gx[a].max(), gy[a].max()))
        if boxes:
            bb = np.array(boxes)
            out[b] = [bb[:, 0].min() - spacing, bb[:, 1].min() - spacing,
                      bb[:, 2].max() + spacing, bb[:, 3].max() + spacing]
        else:
            out[b] = [-half, -half, half, half]
    return out


def realistic_rays(lens, zpos, cam_to_world, p_raster, u_lens,
                   xres, yres, film_diag, pupil=None):
    """Generate world-space rays through the lens stack. p_raster (N,2),
    u_lens (N,2). With `pupil` (the (B,4) boxes from bound_exit_pupil),
    lens samples target the film point's exit-pupil box rotated to its
    azimuth (SampleExitPupil, realistic.cpp:261-272) and the returned
    weight is the box-to-disk area ratio, keeping the estimator's
    rear-disk-uniform normalization; without it, samples cover the full
    rear disk (weight 1) and vignetted lanes are masked."""
    n = p_raster.shape[0]
    aspect = xres / yres
    film_h = film_diag / np.sqrt(1.0 + aspect * aspect)
    film_w = aspect * film_h
    # raster -> physical film point (x right, y up, flipped like the
    # reference's film-to-camera orientation)
    fx = (0.5 - p_raster[:, 0] / xres) * film_w
    fy = (p_raster[:, 1] / yres - 0.5) * film_h
    o_f = jnp.stack([fx, fy, jnp.zeros(n)], -1)
    # aim at a concentric sample of the rear element disk
    from tpupt.core.sampling import concentric_sample_disk

    rear_r = float(lens[-1, 3])
    rear_z = float(zpos[-1])
    if pupil is not None:
        n_bins = pupil.shape[0]
        r_max = film_diag / 2.0
        r_film = jnp.sqrt(fx * fx + fy * fy)
        bin_ = jnp.clip((r_film / r_max * n_bins).astype(jnp.int32),
                        0, n_bins - 1)
        box = pupil[bin_]  # (N,4)
        px_ = box[:, 0] + u_lens[:, 0] * (box[:, 2] - box[:, 0])
        py_ = box[:, 1] + u_lens[:, 1] * (box[:, 3] - box[:, 1])
        # rotate the canonical (+x film) pupil to the film point's azimuth
        inv_r = 1.0 / jnp.maximum(r_film, 1e-12)
        cs = jnp.where(r_film > 1e-9, fx * inv_r, 1.0)
        sn = jnp.where(r_film > 1e-9, fy * inv_r, 0.0)
        lx = cs * px_ - sn * py_
        ly = sn * px_ + cs * py_
        area = (box[:, 2] - box[:, 0]) * (box[:, 3] - box[:, 1])
        weight = area / (np.pi * rear_r * rear_r)
    else:
        cx, cy = concentric_sample_disk(u_lens[:, 0], u_lens[:, 1])
        lx, ly = cx * rear_r, cy * rear_r
        weight = jnp.ones(n)
    p_rear = jnp.stack([lx, ly, jnp.full(n, rear_z)], -1)
    d0 = p_rear - o_f
    d0 = d0 / jnp.sqrt(jnp.maximum(jnp.sum(d0 * d0, -1), 1e-20))[:, None]
    o_l, d_l, alive = trace_lenses_from_film(lens, zpos, o_f, d0)
    # lens space (scene at -z) -> camera space (scene at +z)
    o_c = jnp.stack([o_l[:, 0], o_l[:, 1], -o_l[:, 2]], -1)
    d_c = jnp.stack([d_l[:, 0], d_l[:, 1], -d_l[:, 2]], -1)
    m = cam_to_world
    o_w = o_c @ m[:3, :3].T + m[:3, 3]
    d_w = d_c @ m[:3, :3].T
    d_w = d_w / jnp.sqrt(jnp.maximum(jnp.sum(d_w * d_w, -1), 1e-20))[:, None]
    return o_w, d_w, alive, weight
