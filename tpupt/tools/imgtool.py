"""Image utility CLI (counterpart of src/tools/imgtool.cpp).

    python -m tpupt.tools.imgtool assemble out.exr crop1.exr crop2.exr ...
    python -m tpupt.tools.imgtool cat in.exr
    python -m tpupt.tools.imgtool convert [--scale S --tonemap] in out
    python -m tpupt.tools.imgtool diff [--outfile d.png] a b
    python -m tpupt.tools.imgtool info in.exr
    python -m tpupt.tools.imgtool makesky [--albedo A --elevation deg
        --turbidity T --resolution N] out.exr

`makesky` uses a simplified Preetham-style analytic sky in place of the
reference's vendored Hosek-Wilkie tables (imgtool.cpp:87)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _read(path):
    from tpupt.utils import imageio as io

    ext = os.path.splitext(path)[1].lower()
    if ext == ".exr":
        return io.read_exr(path)
    if ext == ".pfm":
        return io.read_pfm(path)
    return io.read_png(path)


def _write(path, img):
    from tpupt.utils import imageio as io

    ext = os.path.splitext(path)[1].lower()
    if ext == ".exr":
        io.write_exr(path, img)
    elif ext == ".pfm":
        io.write_pfm(path, img)
    else:
        io.write_png(path, img)


def cmd_info(args):
    img = _read(args.input)
    print(f"{args.input}: {img.shape[1]}x{img.shape[0]} ({img.shape[2]} ch)")
    print(f"  min {img.min(axis=(0, 1))}")
    print(f"  max {img.max(axis=(0, 1))}")
    print(f"  avg {img.mean(axis=(0, 1))}")
    lum = img @ np.array([0.2126, 0.7152, 0.0722])
    print(f"  avg luminance {lum.mean():.6f}")
    return 0


def cmd_cat(args):
    img = _read(args.input)
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            print(f"({x},{y}): ({img[y,x,0]:.6g}, {img[y,x,1]:.6g}, "
                  f"{img[y,x,2]:.6g})")
    return 0


def cmd_convert(args):
    img = _read(args.input) * args.scale
    if args.tonemap:
        # simple Reinhard
        lum = img @ np.array([0.2126, 0.7152, 0.0722])
        scale = (1.0 / (1.0 + lum))[..., None]
        img = img * scale
    _write(args.output, img)
    return 0


def cmd_diff(args):
    a = _read(args.a)
    b = _read(args.b)
    if a.shape != b.shape:
        print(f"size mismatch: {a.shape} vs {b.shape}", file=sys.stderr)
        return 1
    d = a - b
    mse = float((d * d).mean())
    avg = float(np.abs(d).mean())
    mx = float(np.abs(d).max())
    print(f"MSE {mse:.3e}  avg abs diff {avg:.3e}  max abs diff {mx:.3e}")
    if args.outfile:
        _write(args.outfile, np.abs(d))
    return 0 if mse <= args.tolerance else 1


def cmd_assemble(args):
    """Stitch crop renders by nonzero coverage (imgtool.cpp assemble)."""
    imgs = [_read(p) for p in args.inputs]
    shape = imgs[0].shape
    out = np.zeros(shape, np.float32)
    count = np.zeros(shape[:2], np.int32)
    for img in imgs:
        if img.shape != shape:
            print("crop size mismatch", file=sys.stderr)
            return 1
        mask = (np.abs(img).sum(-1) > 0)
        out[mask] += img[mask]
        count += mask
    out /= np.maximum(count, 1)[..., None]
    _write(args.output, out)
    return 0


def _hosek_config(turbidity: float, albedo: float, elev: float):
    """Cook the 9 distribution coefficients + radiance per RGB channel from
    the published Hosek-Wilkie dataset (ArHosekSkyModel_CookConfiguration:
    quintic bezier over elevation^(1/3), lerp over turbidity and albedo).
    Returns (config (3,9), radiance (3,)) or None if the dataset npz is
    absent (tools/gen_hosek.py generates it)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "hosek_data.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path)
    cfg, rad = z["config"], z["radiance"]  # (3,2,10,6,9), (3,2,10,6)
    t = float(np.clip(turbidity, 1.0, 10.0))
    it = min(int(t), 9)
    tr = t - it
    x = (elev / (np.pi / 2.0)) ** (1.0 / 3.0)
    # quintic bezier weights over the 6 elevation control points
    w = np.array([(1 - x) ** 5, 5 * (1 - x) ** 4 * x,
                  10 * (1 - x) ** 3 * x ** 2, 10 * (1 - x) ** 2 * x ** 3,
                  5 * (1 - x) * x ** 4, x ** 5])

    def cook(tab):  # tab (3, 2, 10, 6, ...) -> (3, ...)
        lo = np.tensordot(tab[:, :, it - 1], w, axes=([2], [0]))
        out = (1 - albedo) * lo[:, 0] + albedo * lo[:, 1]
        if it < 10 and tr > 0:
            hi = np.tensordot(tab[:, :, it], w, axes=([2], [0]))
            out = (1 - tr) * out + tr * ((1 - albedo) * hi[:, 0]
                                         + albedo * hi[:, 1])
        return out

    return cook(cfg), cook(rad)


def cmd_makesky(args):
    """Equirect sky dome: Hosek-Wilkie 2012 analytic model from the
    published RGB dataset (ArHosekSkyModel parity — the reference's
    makesky, imgtool.cpp:87-187, uses the spectral variant of the same
    model); falls back to a simplified Preetham sky if the dataset npz has
    not been generated."""
    n = args.resolution
    h, w = n, 2 * n
    theta = (np.arange(h) + 0.5) / h * np.pi
    phi = (np.arange(w) + 0.5) / w * 2 * np.pi
    T, P = np.meshgrid(theta, phi, indexing="ij")
    elev = np.deg2rad(args.elevation)
    sun_dir = np.array([np.cos(elev), 0.0, np.sin(elev)])
    d = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1)
    cos_g = np.clip(d @ sun_dir, -1, 1)
    gamma = np.arccos(cos_g)
    cos_t = np.clip(np.cos(T), 1e-3, 1)
    t = args.turbidity

    hk = _hosek_config(t, args.albedo, elev)
    if hk is not None:
        cfg, rad = hk
        sky = np.zeros((h, w, 3), np.float64)
        for c in range(3):
            A, B, C, D, E, F_c, G, H, I = cfg[c]
            expM = np.exp(E * gamma)
            rayM = cos_g * cos_g
            mieM = (1.0 + rayM) / np.power(
                np.maximum(1.0 + H * H - 2.0 * H * cos_g, 1e-9), 1.5)
            zenith = np.sqrt(cos_t)
            F_val = ((1.0 + A * np.exp(B / (cos_t + 0.01)))
                     * (C + D * expM + F_c * rayM + G * mieM + I * zenith))
            sky[..., c] = np.maximum(F_val * rad[c], 0.0)
        # solar disc (~0.51 deg diameter): the tristim dataset is sky-only;
        # approximate the disc with the sky-relative solar radiance scale
        sun_r = np.deg2rad(0.255)
        disc = (gamma < sun_r)[..., None] * sky.max() * 5e3
        img = (sky + disc) * (T < np.pi / 2)[..., None]
        img = img + args.albedo * 0.2 * sky.mean() * (T >= np.pi / 2)[..., None]
        _write(args.output, img.astype(np.float32))
        return 0
    # Preetham luminance distribution coefficients
    A = 0.1787 * t - 1.4630
    B = -0.3554 * t + 0.4275
    C = -0.0227 * t + 5.3251
    D = 0.1206 * t - 2.5771
    E = -0.0670 * t + 0.3703
    F_ = ((1 + A * np.exp(B / cos_t))
          * (1 + C * np.exp(D * gamma) + E * cos_g ** 2))
    F_ = np.maximum(F_, 0.0)
    sky = np.stack([0.45 * F_, 0.55 * F_, 0.9 * F_], -1)  # blue-ish tint
    sun = np.exp(-np.maximum(gamma, 0) * 120.0)[..., None] * np.array(
        [120.0, 110.0, 95.0])
    img = (sky + sun) * (T < np.pi / 2)[..., None]  # ground half black
    img = img + args.albedo * 0.2 * (T >= np.pi / 2)[..., None]
    _write(args.output, img.astype(np.float32))
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="imgtool")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("info"); p.add_argument("input")
    p = sub.add_parser("cat"); p.add_argument("input")
    p = sub.add_parser("convert")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--tonemap", action="store_true")
    p.add_argument("input"); p.add_argument("output")
    p = sub.add_parser("diff")
    p.add_argument("--outfile", default=None)
    p.add_argument("--tolerance", type=float, default=float("inf"))
    p.add_argument("a"); p.add_argument("b")
    p = sub.add_parser("assemble")
    p.add_argument("output"); p.add_argument("inputs", nargs="+")
    p = sub.add_parser("makesky")
    p.add_argument("--albedo", type=float, default=0.5)
    p.add_argument("--elevation", type=float, default=10.0)
    p.add_argument("--turbidity", type=float, default=3.0)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("output")
    args = ap.parse_args(argv)
    return {"info": cmd_info, "cat": cmd_cat, "convert": cmd_convert,
            "diff": cmd_diff, "assemble": cmd_assemble,
            "makesky": cmd_makesky}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
