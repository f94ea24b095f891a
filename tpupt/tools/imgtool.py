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


def cmd_makesky(args):
    """Equirect sky dome, simplified Preetham analytic model."""
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
