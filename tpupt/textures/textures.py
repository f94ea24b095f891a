"""Texture evaluation on flat tables (counterpart of src/textures/ and
core/texture.* / mipmap.h).

Host side: `TextureTable.build` resolves the scene's named-texture DAG into
  * a flat texel atlas (all image maps + their mip pyramids concatenated
    into one (X, 3) array; per-level offsets in an int table), and
  * a parameter table per texture row (type id, constant values, nested
    refs resolved one level deep, UV scaling, noise params).
Device side: `eval_texture` computes any texture type for a hit batch —
procedural noise is a hash-based Perlin (core/texture.cpp Noise's tables
replaced by on-the-fly PCG gradient hashing), image maps are bilinear
gathers from the atlas with a mip level chosen by the caller (trilinear EWA
of mipmap.h is approximated by per-hit bilinear at level 0 + optional level
bias — AOV-driven filtering lands with ray differentials).
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

(TEX_CONSTANT, TEX_SCALE, TEX_MIX, TEX_CHECKER, TEX_UV, TEX_IMAGEMAP,
 TEX_FBM, TEX_WRINKLED, TEX_MARBLE, TEX_WINDY, TEX_DOTS,
 TEX_BILERP, TEX_CHECKER3D, TEX_PTEX) = range(14)

_TEX_IDS = {"constant": TEX_CONSTANT, "scale": TEX_SCALE, "mix": TEX_MIX,
            "checkerboard": TEX_CHECKER, "uv": TEX_UV, "imagemap": TEX_IMAGEMAP,
            "fbm": TEX_FBM, "wrinkled": TEX_WRINKLED, "marble": TEX_MARBLE,
            "windy": TEX_WINDY, "dots": TEX_DOTS, "bilerp": TEX_BILERP,
            "ptex": TEX_PTEX}


class TextureTable:
    """Flat texture tensors + name->id map."""

    def __init__(self):
        self.type: List[int] = []
        self.v1: List[np.ndarray] = []   # (3,) main value / tex1 constant
        self.v2: List[np.ndarray] = []   # (3,) secondary / tex2 constant
        self.uvscale: List[Tuple[float, float]] = []
        self.f1: List[float] = []        # octaves / omega / variation
        self.f2: List[float] = []
        self.img_off: List[int] = []     # atlas offset (level 0)
        self.img_w: List[int] = []
        self.img_h: List[int] = []
        self.atlas: List[np.ndarray] = []
        self.atlas_len = 0
        self.mip_off: List[np.ndarray] = []   # (MAX_MIP,) atlas offsets/level
        self.mips: List[int] = []
        self.w2t: List[np.ndarray] = []       # (4,4) world->texture (3D tex)
        # global per-face tables for ptex rows (textures/ptex.py): a ptex
        # row's img_off = first face index here, img_w = its face count
        self.ptex_off: List[int] = []
        self.ptex_w: List[int] = []
        self.ptex_h: List[int] = []
        self.name_to_id: Dict[str, int] = {}

    @staticmethod
    def build(textures: Dict, scene_dir: str) -> "TextureTable":
        t = TextureTable()
        for name, td in textures.items():
            t._add(name, td, textures, scene_dir)
        return t

    def _resolve_const(self, pname, params, textures, default):
        ref = params.find_texture(pname)
        if ref is not None and ref in textures:
            td = textures[ref]
            if td.klass == "constant":
                return np.asarray(
                    td.params.find_one_spectrum("value", default), np.float64)
            warnings.warn(f"nested non-constant texture {ref!r} folded to mean")
        return params.find_one_spectrum(pname, default)

    def _add(self, name, td, textures, scene_dir):
        p = td.params
        ttype = _TEX_IDS.get(td.klass)
        if ttype is None:
            warnings.warn(f"texture class {td.klass!r} unsupported; constant 0.5")
            ttype = TEX_CONSTANT
        row = dict(type=ttype, v1=np.array([0.5] * 3), v2=np.zeros(3),
                   uvscale=(p.find_one_float("uscale", 1.0),
                            p.find_one_float("vscale", 1.0)),
                   f1=0.0, f2=0.0, off=0, w=0, h=0)
        if ttype == TEX_CONSTANT:
            row["v1"] = p.find_one_spectrum("value", [1, 1, 1])
        elif ttype in (TEX_SCALE, TEX_MIX, TEX_CHECKER, TEX_DOTS, TEX_BILERP):
            d1 = [1, 1, 1] if ttype != TEX_MIX else [0, 0, 0]
            row["v1"] = self._resolve_const("tex1", p, textures, d1)
            row["v2"] = self._resolve_const("tex2", p, textures, [1, 1, 1]
                                            if ttype != TEX_CHECKER else [0, 0, 0])
            if ttype == TEX_MIX:
                row["f1"] = p.find_one_float("amount", 0.5)
            if ttype == TEX_CHECKER:
                # dimension 3 -> solid checkerboard over world/texture space
                # (Checkerboard3DTexture, checkerboard.h:250); 2D carries the
                # closed-form box-filter AA flag (checkerboard.h:108
                # AAMethod::ClosedForm, the pbrt default)
                if p.find_one_int("dimension", 2) == 3:
                    row["type"] = TEX_CHECKER3D
                else:
                    row["f1"] = float(
                        p.find_one_string("aamode", "closedform")
                        == "closedform")
        elif ttype == TEX_IMAGEMAP:
            fn = p.find_one_string("filename", "")
            path = fn if os.path.isabs(fn) else os.path.join(scene_dir, fn)
            img = _load_image(path)
            if img is None:
                warnings.warn(f"imagemap {fn!r} not found; gray")
                row["type"] = TEX_CONSTANT
            else:
                scale = p.find_one_float("scale", 1.0)
                img = img * scale
                row["off"] = self.atlas_len
                row["w"] = img.shape[1]
                row["h"] = img.shape[0]
                # mip pyramid: box-filtered halvings down to 1x1, levels
                # stored back-to-back in the atlas (MIPMap ctor, mipmap.h)
                lvl = img.astype(np.float32)
                offs = []
                while True:
                    offs.append(self.atlas_len)
                    flat = lvl.reshape(-1, 3).astype(np.float32)
                    self.atlas.append(flat)
                    self.atlas_len += len(flat)
                    h_, w_ = lvl.shape[:2]
                    if w_ <= 1 and h_ <= 1:
                        break
                    w2, h2 = max(w_ // 2, 1), max(h_ // 2, 1)
                    sy = 2 if h_ > 1 else 1
                    sx = 2 if w_ > 1 else 1
                    lvl = lvl[: h2 * sy, : w2 * sx].reshape(
                        h2, sy, w2, sx, 3).mean((1, 3))
                row["mip_off"] = offs
                row["mips"] = len(offs)
        elif ttype == TEX_PTEX:
            fn = p.find_one_string("filename", "")
            path = fn if os.path.isabs(fn) else os.path.join(scene_dir, fn)
            gamma = p.find_one_float("gamma", 2.2)
            faces = None
            if os.path.isfile(path):
                from tpupt.textures.ptex import read_ptex
                try:
                    faces, _mesh = read_ptex(path)
                except Exception as e:
                    warnings.warn(f"ptex {fn!r} unreadable ({e}); gray")
            else:
                warnings.warn(f"ptex {fn!r} not found; gray")
            if not faces:
                row["type"] = TEX_CONSTANT
            else:
                row["off"] = len(self.ptex_off)  # first face index
                row["w"] = len(faces)            # face count
                for f in faces:
                    f = np.asarray(f, np.float32)
                    if f.shape[-1] == 1:
                        f = np.repeat(f, 3, -1)
                    # gamma decode at load (ptex.cpp:159 applies pow(gamma)
                    # to in-gamut results; per-texel at load is the same
                    # computation hoisted out of the hot loop)
                    if gamma != 1.0:
                        f = np.where((f >= 0) & (f <= 1),
                                     f ** np.float32(gamma), f)
                    self.ptex_off.append(self.atlas_len)
                    self.ptex_h.append(f.shape[0])
                    self.ptex_w.append(f.shape[1])
                    self.atlas.append(f[..., :3].reshape(-1, 3))
                    self.atlas_len += f.shape[0] * f.shape[1]
        elif ttype in (TEX_FBM, TEX_WRINKLED):
            row["f1"] = float(p.find_one_int("octaves", 8))
            row["f2"] = p.find_one_float("roughness", 0.5)
        elif ttype == TEX_MARBLE:
            row["f1"] = float(p.find_one_int("octaves", 8))
            row["f2"] = p.find_one_float("scale", 1.0)
        self.name_to_id[name] = len(self.type)
        w2t = np.eye(4, dtype=np.float64)
        if getattr(td, "tex2world", None) is not None:
            try:
                w2t = td.tex2world.m_inv
            except Exception:
                pass
        self.w2t.append(np.asarray(w2t, np.float64))
        self.type.append(row["type"])
        self.v1.append(np.asarray(row["v1"], np.float64))
        self.v2.append(np.asarray(row["v2"], np.float64))
        self.uvscale.append(row["uvscale"])
        self.f1.append(row["f1"])
        self.f2.append(row["f2"])
        self.img_off.append(row["off"])
        self.img_w.append(row["w"])
        self.img_h.append(row["h"])
        mo = np.full(16, row["off"], np.int64)
        offs = row.get("mip_off", [])
        mo[: min(len(offs), 16)] = offs[:16]
        if offs:
            mo[len(offs):] = offs[-1]  # clamp to the 1x1 level
        self.mip_off.append(mo)
        self.mips.append(row.get("mips", 1))

    def arrays(self):
        n = max(len(self.type), 1)

        def pad(lst, fill, dtype, shape=()):
            a = np.asarray(lst if lst else [fill], dtype)
            return a
        atlas = (np.concatenate(self.atlas) if self.atlas
                 else np.ones((1, 3), np.float32) * 0.5)
        return dict(
            tex_type=np.asarray(self.type or [0], np.int32),
            tex_v1=np.asarray(self.v1 or [[0.5] * 3], np.float32),
            tex_v2=np.asarray(self.v2 or [[0.0] * 3], np.float32),
            tex_uvscale=np.asarray(self.uvscale or [(1.0, 1.0)], np.float32),
            tex_f1=np.asarray(self.f1 or [0.0], np.float32),
            tex_f2=np.asarray(self.f2 or [0.0], np.float32),
            tex_img_off=np.asarray(self.img_off or [0], np.int32),
            tex_img_w=np.asarray(self.img_w or [0], np.int32),
            tex_img_h=np.asarray(self.img_h or [0], np.int32),
            tex_mip_off=(np.stack(self.mip_off).astype(np.int32)
                         if self.mip_off else np.zeros((1, 16), np.int32)),
            tex_mips=np.asarray(self.mips or [1], np.int32),
            tex_atlas=atlas,
            tex_w2t=(np.stack(self.w2t).astype(np.float32) if self.w2t
                     else np.eye(4, dtype=np.float32)[None]),
            tex_ptex_off=np.asarray(self.ptex_off or [0], np.int32),
            tex_ptex_w=np.asarray(self.ptex_w or [1], np.int32),
            tex_ptex_h=np.asarray(self.ptex_h or [1], np.int32),
        )


def _load_image(path):
    from tpupt.utils import imageio as io

    if not os.path.isfile(path):
        # try sibling extensions
        base = os.path.splitext(path)[0]
        for ext in (".png", ".tga", ".exr", ".pfm"):
            if os.path.isfile(base + ext):
                path = base + ext
                break
        else:
            return None
    ext = os.path.splitext(path)[1].lower()
    try:
        if ext == ".exr":
            return io.read_exr(path)
        if ext == ".pfm":
            return io.read_pfm(path)
        return io.read_png(path)  # PIL handles png/tga/jpg
    except Exception as e:
        warnings.warn(f"failed to load {path}: {e}")
        return None


# ------------------------------ perlin noise --------------------------------


def _grad_hash(ix, iy, iz):
    from tpupt.core.rng import uniform_u32

    h = uniform_u32(ix.astype(jnp.uint32), iy.astype(jnp.uint32),
                    iz.astype(jnp.uint32))
    return h


def _gradient(h, fx, fy, fz):
    """12-direction gradient dot product (texture.cpp Grad)."""
    h = h & jnp.uint32(15)
    u = jnp.where(h < 8, fx, fy)
    v = jnp.where(h < 4, fy, jnp.where((h == 12) | (h == 14), fx, fz))
    return (jnp.where(h & 1, -u, u) + jnp.where(h & 2, -v, v))


def perlin(p):
    """3D gradient noise in [-1,1] (core/texture.cpp Noise; permutation
    table replaced by hashing)."""
    pi = jnp.floor(p)
    pf = p - pi
    ix = pi[..., 0].astype(jnp.int32)
    iy = pi[..., 1].astype(jnp.int32)
    iz = pi[..., 2].astype(jnp.int32)
    fx, fy, fz = pf[..., 0], pf[..., 1], pf[..., 2]

    def w(t):  # quintic smoothstep (NoiseWeight)
        return t * t * t * (t * (t * 6 - 15) + 10)

    wx, wy, wz = w(fx), w(fy), w(fz)
    out = 0.0
    vals = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                h = _grad_hash(ix + dx, iy + dy, iz + dz)
                g = _gradient(h, fx - dx, fy - dy, fz - dz)
                weight = ((wx if dx else (1 - wx)) * (wy if dy else (1 - wy))
                          * (wz if dz else (1 - wz)))
                vals.append(g * weight)
    return sum(vals)


def fbm(p, omega, octaves: int):
    """texture.cpp FBm (without the ray-differential octave clamp)."""
    s = 0.0
    lam, o = 1.0, 1.0
    for _ in range(octaves):
        s = s + o * perlin(p * lam)
        lam *= 1.99
        o *= omega
    return s


def turbulence(p, omega, octaves: int):
    s = 0.0
    lam, o = 1.0, 1.0
    for _ in range(octaves):
        s = s + o * jnp.abs(perlin(p * lam))
        lam *= 1.99
        o *= omega
    return s


# ------------------------------ evaluation ----------------------------------


def eval_texture(tx, tex_id, uv, p_world, width=None, aniso=None,
                 face=None):
    """Evaluate texture rows for a hit batch. tx: dict of jnp arrays from
    TextureTable.arrays(); tex_id (N,) i32 (valid ids); uv (N,2); p (N,3).
    `width` (N,) is the uv-space footprint for mip selection (mipmap.h
    Lookup(st, width): level = nLevels - 1 + log2(max(width, eps))); None
    reads level 0. `aniso` (N,2) is the uv-space major-axis DIAMETER of
    the footprint ellipse and adds EWA-style anisotropic filtering
    (mipmap.h EWA re-architected for static shapes: a fixed 4-tap Gaussian
    line filter along the major axis, each tap a trilinear fetch at the
    MINOR-axis level given by `width` — the construction hardware
    anisotropic filtering uses; eccentricity is clamped by the caller like
    the reference's MaxAnisotropy, mipmap.h:180). Returns (N,3).
    Computes every texture type once and selects (few types,
    VPU-friendly)."""
    t = tx["tex_type"][tex_id]
    v1 = tx["tex_v1"][tex_id]
    v2 = tx["tex_v2"][tex_id]
    us = tx["tex_uvscale"][tex_id]
    f1 = tx["tex_f1"][tex_id]
    f2 = tx["tex_f2"][tex_id]
    u = uv[:, 0] * us[:, 0]
    v = uv[:, 1] * us[:, 1]

    out = v1  # constant

    # scale: v1 * v2
    out = jnp.where((t == TEX_SCALE)[:, None], v1 * v2, out)
    # mix: lerp(amount, tex1, tex2)
    out = jnp.where((t == TEX_MIX)[:, None],
                    (1.0 - f1)[:, None] * v1 + f1[:, None] * v2, out)
    # checkerboard 2D (textures/checkerboard.h): point-sampled, plus the
    # closed-form box-filter antialiasing over the uv footprint when a
    # width is available and the row's aamode is closedform
    # (checkerboard.h:116-147)
    check = (jnp.floor(u).astype(jnp.int32)
             + jnp.floor(v).astype(jnp.int32)) % 2 == 0
    chk_val = jnp.where(check[:, None], v1, v2)
    if width is not None:
        # bumpInt(x) = integral of the 1D square wave's tex2 indicator
        def bump_int(x):
            fh = jnp.floor(x / 2.0)
            return fh + 2.0 * jnp.maximum(x / 2.0 - fh - 0.5, 0.0)

        du = jnp.maximum(width, 1e-8)
        s0, s1 = u - du, u + du
        t0_, t1_ = v - du, v + du
        sint = (bump_int(s1) - bump_int(s0)) / (2.0 * du)
        tint = (bump_int(t1_) - bump_int(t0_)) / (2.0 * du)
        area2 = sint + tint - 2.0 * sint * tint  # fraction covered by tex2
        area2 = jnp.clip(area2, 0.0, 1.0)
        aa_val = v1 * (1.0 - area2)[:, None] + v2 * area2[:, None]
        chk_val = jnp.where((f1 > 0.5)[:, None], aa_val, chk_val)
    out = jnp.where((t == TEX_CHECKER)[:, None], chk_val, out)
    # solid 3D checkerboard in texture space (Checkerboard3DTexture,
    # checkerboard.h:250: parity of the world->texture-mapped point)
    w2t = tx.get("tex_w2t")
    if w2t is not None:
        m = w2t[tex_id]  # (N,4,4)
        pt = jnp.einsum("nij,nj->ni", m[:, :3, :3], p_world) + m[:, :3, 3]
        c3 = (jnp.floor(pt[:, 0]).astype(jnp.int32)
              + jnp.floor(pt[:, 1]).astype(jnp.int32)
              + jnp.floor(pt[:, 2]).astype(jnp.int32)) % 2 == 0
        out = jnp.where((t == TEX_CHECKER3D)[:, None],
                        jnp.where(c3[:, None], v1, v2), out)
    # uv debug texture
    uv_col = jnp.stack([u - jnp.floor(u), v - jnp.floor(v),
                        jnp.zeros_like(u)], -1)
    out = jnp.where((t == TEX_UV)[:, None], uv_col, out)
    # bilerp corners v00=v1, v11=v2 (subset)
    bil = ((1 - u)[:, None] * (1 - v)[:, None] * v1
           + (u * v)[:, None] * v2)
    out = jnp.where((t == TEX_BILERP)[:, None], bil, out)
    # dots (textures/dots.h: per-cell random dot)
    from tpupt.core.rng import uniform_float

    cu = jnp.floor(u + 0.5).astype(jnp.int32)
    cv = jnp.floor(v + 0.5).astype(jnp.int32)
    has_dot = uniform_float(cu.astype(jnp.uint32), cv.astype(jnp.uint32), 1) < 1.0
    dcx = cu + (uniform_float(cu.astype(jnp.uint32), cv.astype(jnp.uint32), 2) - 0.5) * 0.7
    dcy = cv + (uniform_float(cu.astype(jnp.uint32), cv.astype(jnp.uint32), 3) - 0.5) * 0.7
    rad = 0.35 * uniform_float(cu.astype(jnp.uint32), cv.astype(jnp.uint32), 4)
    inside = has_dot & ((u - dcx) ** 2 + (v - dcy) ** 2 < rad * rad)
    out = jnp.where((t == TEX_DOTS)[:, None],
                    jnp.where(inside[:, None], v1, v2), out)
    # procedural noise family
    any_noise = ((t == TEX_FBM) | (t == TEX_WRINKLED) | (t == TEX_MARBLE)
                 | (t == TEX_WINDY))
    octaves = 6  # static octave count (ray-differential clamp later)
    fbm_v = fbm(p_world, 0.5, octaves)
    turb_v = turbulence(p_world, 0.5, octaves)
    out = jnp.where((t == TEX_FBM)[:, None], fbm_v[:, None], out)
    out = jnp.where((t == TEX_WRINKLED)[:, None], turb_v[:, None], out)
    # windy (textures/windy.h): FBm(0.1p) * |FBm(p)|
    wind = fbm(p_world * 0.1, 0.5, 3)
    wave = jnp.abs(fbm(p_world, 0.5, 6))
    out = jnp.where((t == TEX_WINDY)[:, None], (wind * wave)[:, None], out)
    # marble (textures/marble.h): spline over sin + turbulence
    mscale = jnp.where(f2 > 0, f2, 1.0)
    marb = jnp.sin(p_world[:, 1] * mscale * 4.0
                   + 10.0 * turbulence(p_world * mscale[:, None], 0.5, 6))
    marb01 = 0.5 + 0.5 * marb
    marble_col = jnp.stack(
        [0.58 + 0.38 * marb01, 0.58 + 0.30 * marb01, 0.6 + 0.25 * marb01], -1)
    out = jnp.where((t == TEX_MARBLE)[:, None], marble_col, out)

    # imagemap: TRILINEAR fetch from the mip pyramid (MIPMap::Lookup,
    # mipmap.h: bilinear at the two bracketing levels, lerped)
    w_img = tx["tex_img_w"][tex_id]
    h_img = tx["tex_img_h"][tex_id]
    mips = tx["tex_mips"][tex_id]
    mip_off = tx["tex_mip_off"][tex_id]  # (N,16)
    has_img = w_img > 0
    wu = u - jnp.floor(u)
    wv = v - jnp.floor(v)
    atlas = tx["tex_atlas"]

    def fetch_level(lvl, wu_=None, wv_=None):
        wu_ = wu if wu_ is None else wu_
        wv_ = wv if wv_ is None else wv_
        off_l = jnp.take_along_axis(mip_off, lvl[:, None], 1)[:, 0]
        w_l = jnp.maximum(jnp.right_shift(w_img, lvl), 1)
        h_l = jnp.maximum(jnp.right_shift(h_img, lvl), 1)
        fx = wu_ * w_l - 0.5
        fy = (1.0 - wv_) * h_l - 0.5  # v=0 at image bottom
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        ax = (fx - x0)[:, None]
        ay = (fy - y0)[:, None]

        def texel(xi, yi):
            xi = jnp.clip(xi.astype(jnp.int32) % w_l, 0, None)
            yi = jnp.clip(yi.astype(jnp.int32) % h_l, 0, None)
            idx = jnp.clip(off_l + yi * w_l + xi, 0, atlas.shape[0] - 1)
            return atlas[idx]

        return ((1 - ax) * (1 - ay) * texel(x0, y0)
                + ax * (1 - ay) * texel(x0 + 1, y0)
                + (1 - ax) * ay * texel(x0, y0 + 1)
                + ax * ay * texel(x0 + 1, y0 + 1))

    def trilinear(wu_, wv_, width_):
        lvl_f = (mips - 1).astype(jnp.float32) + jnp.log2(
            jnp.maximum(width_, 1e-8))
        lvl_f = jnp.clip(lvl_f, 0.0, jnp.maximum(mips - 1, 0))
        l0 = jnp.floor(lvl_f).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, jnp.maximum(mips - 1, 0))
        tt = (lvl_f - l0)[:, None]
        return ((1.0 - tt) * fetch_level(l0, wu_, wv_)
                + tt * fetch_level(l1, wu_, wv_))

    if width is None:
        img_val = fetch_level(jnp.zeros_like(w_img), wu, wv)
    elif aniso is None:
        img_val = trilinear(wu, wv, width)
    else:
        # EWA-style anisotropic: 4 Gaussian taps along the uv major axis
        # at the minor-axis mip level (mipmap.h EWA; fixed tap count keeps
        # shapes static). aniso spans the FULL major diameter.
        duv_major = aniso
        img_val = 0.0
        taps = ((-0.375, 0.274), (-0.125, 0.323),
                (0.125, 0.323), (0.375, 0.274))
        wsum = sum(w for _, w in taps)
        for off, wgt in taps:
            tu = uv[:, 0] + off * duv_major[:, 0]
            tv = uv[:, 1] + off * duv_major[:, 1]
            tu = tu * us[:, 0]
            tv = tv * us[:, 1]
            img_val = img_val + (wgt / wsum) * trilinear(
                tu - jnp.floor(tu), tv - jnp.floor(tv), width)
    out = jnp.where((t == TEX_IMAGEMAP)[:, None] & has_img[:, None],
                    img_val, out)

    # ptex: per-face texel grid selected by the hit's faceIndex
    # (PtexTexture::Evaluate, ptex.cpp:137-165; faceIndex threading
    # interaction.h:156). Bilinear with clamped face edges — the local uv
    # addresses the face's own grid, no wrap.
    if face is not None and "tex_ptex_off" in tx:
        pw_all = tx["tex_ptex_w"]
        first = tx["tex_img_off"][tex_id]          # first face index
        nf = jnp.maximum(tx["tex_img_w"][tex_id], 1)
        fidx = jnp.clip(first + jnp.clip(face, 0, nf - 1),
                        0, pw_all.shape[0] - 1)
        f_off = tx["tex_ptex_off"][fidx]
        f_w = pw_all[fidx]
        f_h = tx["tex_ptex_h"][fidx]
        fx = jnp.clip(uv[:, 0], 0.0, 1.0) * f_w - 0.5
        fy = (1.0 - jnp.clip(uv[:, 1], 0.0, 1.0)) * f_h - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        ax = (fx - x0)[:, None]
        ay = (fy - y0)[:, None]

        def ptexel(xi, yi):
            xi = jnp.clip(xi.astype(jnp.int32), 0, f_w - 1)
            yi = jnp.clip(yi.astype(jnp.int32), 0, f_h - 1)
            idx = jnp.clip(f_off + yi * f_w + xi, 0, atlas.shape[0] - 1)
            return atlas[idx]

        ptx_val = ((1 - ax) * (1 - ay) * ptexel(x0, y0)
                   + ax * (1 - ay) * ptexel(x0 + 1, y0)
                   + (1 - ax) * ay * ptexel(x0, y0 + 1)
                   + ax * ay * ptexel(x0 + 1, y0 + 1))
        out = jnp.where((t == TEX_PTEX)[:, None], ptx_val, out)
    return out
