"""Benchmark sweep launcher (counterpart of scripts/run_distributed.sh +
render_simple.sh — the thesis's ssh farm, re-expressed as a config sweep).

    python -m tpupt.tools.sweep scene.pbrt \
        --set acc=bvh,kdtree,rbsp --set accnr=3,7,9,13 \
        --spp 8 --resolution 256x256 --outdir results/

The reference's sed templating ($acc, $accnr, ... placeholders,
render_simple.sh:24-29) is applied through the loader's `subst` mechanism;
each config renders sequentially on the local chip (multi-host fan-out goes
through jax.distributed / the mesh instead of ssh), writing the image, the
per-pixel telemetry matrices, and a stats JSON per config."""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sweep")
    ap.add_argument("scene")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=V1,V2,...")
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--resolution", default=None)
    ap.add_argument("--outdir", default="sweep_out")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpupt.scene.loader import parse_file
    from tpupt.scene.flatten import flatten, with_resolution
    from tpupt.integrators.path import Renderer
    from tpupt.utils import imageio

    keys, values = [], []
    for spec in args.set:
        k, v = spec.split("=", 1)
        keys.append(k)
        values.append(v.split(","))

    os.makedirs(args.outdir, exist_ok=True)
    results = []
    for combo in itertools.product(*values) if values else [()]:
        subst = {f"${k}": (f'"{v}"' if not v.replace(".", "").isdigit() else v)
                 for k, v in zip(keys, combo)}
        tag = "_".join(f"{k}-{v}" for k, v in zip(keys, combo)) or "default"
        print(f"=== {tag} ===", flush=True)
        t0 = time.time()
        scene = flatten(parse_file(args.scene, subst=subst),
                        os.path.dirname(os.path.abspath(args.scene)))
        if args.resolution:
            w, h = (int(x) for x in args.resolution.lower().split("x"))
            scene = with_resolution(scene, w, h)
        r = Renderer(scene)
        build_s = time.time() - t0
        t0 = time.time()
        film = r.render(spp=args.spp)
        jax.block_until_ready(film.rgb)
        render_s = time.time() - t0
        img = r.image(film)
        imageio.write_png(os.path.join(args.outdir, f"{tag}.png"), img)
        aov = r.aovs(film)
        import numpy as np

        for k, v in aov.items():
            np.savetxt(os.path.join(args.outdir, f"{tag}.{k}.txt"), v,
                       fmt="%.2f")
        rec = dict(tag=tag, build_s=round(build_s, 2),
                   render_s=round(render_s, 2),
                   spp=args.spp or scene.sampler.spp,
                   accel=getattr(r, "accel_stats", {}),
                   mean_node_visits=float(aov["node_visits"].mean()),
                   mean_prim_tests=float(aov["prim_tests"].mean()))
        results.append(rec)
        print(json.dumps(rec), flush=True)
    with open(os.path.join(args.outdir, "sweep.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.outdir}/sweep.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
