"""CLI renderer (counterpart of src/main/pbrt.cpp).

    python -m tpupt.tools.render scene.pbrt [--outfile out.png] [--spp N]
        [--resolution WxH] [--quick] [--cpu] [--quiet] [--stats]
        [--cropwindow x0 x1 y0 y1] [--writestats]

Flags mirror the reference CLI (pbrt.cpp:47-71): --quick quarters resolution
and drops spp to 1; --cropwindow limits the rendered region; --writestats
dumps the per-pixel telemetry matrices next to the image (Film::
WriteGeneralStats parity, film.cpp:170)."""

from __future__ import annotations

import argparse
import os
import sys
import time
import warnings


def main(argv=None):
    ap = argparse.ArgumentParser(description="tpupt renderer")
    ap.add_argument("scene")
    ap.add_argument("--outfile", "-o", default=None)
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--resolution", default=None, help="WxH override")
    ap.add_argument("--quick", action="store_true",
                    help="1/4 resolution, 1 spp (pbrt --quick)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--spectral", action="store_true",
                    help="full 60-bin sampled-spectrum transport "
                         "(PBRT_SAMPLED_SPECTRUM analog, spectrum.h:289)")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--stats", action="store_true",
                    help="print render statistics (pbrt PrintStats)")
    ap.add_argument("--writestats", action="store_true",
                    help="write per-pixel telemetry matrices (thesis "
                         "WriteGeneralStats parity)")
    ap.add_argument("--cropwindow", type=float, nargs=4, default=None,
                    metavar=("X0", "X1", "Y0", "Y1"))
    ap.add_argument("--accelerator", default=None,
                    help="override the scene accelerator (bvh/kdtree/...)")
    ap.add_argument("--cat", action="store_true",
                    help="print the parsed scene as canonical pbrt "
                         "statements and exit (pbrt --cat)")
    ap.add_argument("--toply", action="store_true",
                    help="like --cat but convert inline trianglemeshes to "
                         "binary PLY sidecars (pbrt --toply)")
    ap.add_argument("--dumptree", action="store_true",
                    help="write the full accelerator-tree serialization "
                         "(GenericBSP operator<<, off by default like the "
                         "reference's writeFile)")
    ap.add_argument("--mesh", action="store_true",
                    help="shard rays over every visible device "
                         "(jax.sharding.Mesh data parallelism)")
    ap.add_argument("--distributed", default=None, metavar="HOST:PORT",
                    help="multi-host rendering: coordinator address "
                         "(the reference ssh farm, run_distributed.sh, as "
                         "one jax.distributed job); implies --mesh")
    ap.add_argument("--num-hosts", type=int, default=None)
    ap.add_argument("--host-id", type=int, default=None)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the render (the "
                         "TPU analog of the reference's SIGPROF sampling "
                         "profiler, stats.cpp:222; view in TensorBoard)")
    ap.add_argument("--logfile", default=None,
                    help="append structured logs to a file (glog analog)")
    ap.add_argument("--loglevel", default="info",
                    choices=["debug", "info", "warning", "error"])
    args = ap.parse_args(argv)

    from tpupt.utils import logging as tlog

    tlog.set_level(args.loglevel)
    if args.logfile:
        tlog.set_logfile(args.logfile)

    if args.quiet:
        warnings.simplefilter("ignore")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.distributed is not None:
        from tpupt.parallel.mesh import init_distributed

        pid, pcount = init_distributed(args.distributed, args.num_hosts,
                                       args.host_id)
        args.mesh = True
        if not args.quiet:
            print(f"distributed: process {pid}/{pcount}, "
                  f"{len(jax.devices())} global devices")

    from tpupt.scene.loader import parse_file
    from tpupt.scene.flatten import flatten, with_resolution
    from tpupt.integrators.path import Renderer
    from tpupt.utils import imageio

    t0 = time.time()
    desc = parse_file(args.scene)
    if args.cat or args.toply:
        import sys as _sys

        from tpupt.tools.catscene import cat_scene

        # PLY sidecars go to the CURRENT directory like the reference
        # (pbrt --toply writes relative to cwd) — never into the source
        # scene's directory, where mesh_NNNNN.ply could silently
        # overwrite existing files (ADVICE r4)
        out_dir = os.getcwd()
        n_ply = cat_scene(desc, _sys.stdout, to_ply=args.toply,
                          ply_dir=out_dir)
        if args.toply and not args.quiet:
            print(f"# wrote {n_ply} PLY sidecars to {out_dir}",
                  file=_sys.stderr)
        return 0
    scene = flatten(desc, os.path.dirname(os.path.abspath(args.scene)))
    if args.accelerator:
        scene.accelerator_name = args.accelerator
    if args.resolution:
        w, h = (int(x) for x in args.resolution.lower().split("x"))
        scene = with_resolution(scene, w, h)
    if args.quick:
        scene = with_resolution(scene, max(scene.film.xres // 4, 16),
                                max(scene.film.yres // 4, 16))
        scene.sampler.spp = 1
    if args.cropwindow:
        import dataclasses

        scene = dataclasses.replace(
            scene, film=dataclasses.replace(scene.film,
                                            crop=tuple(args.cropwindow)))
    if not args.quiet:
        print(f"parsed+flattened in {time.time() - t0:.1f}s: "
              f"{scene.triangles.count} tris, {scene.spheres.count} spheres, "
              f"{scene.lights.count} lights, {scene.materials.count} materials")

    t0 = time.time()
    r = Renderer(scene, collect_stats=args.stats or args.writestats,
                 spectral=args.spectral)
    build_s = time.time() - t0
    if not args.quiet:
        print(f"BVH + pipeline built in {build_s:.1f}s "
              f"({r.st.n_nodes} nodes)")

    spp = args.spp or scene.sampler.spp
    t0 = time.time()
    name = scene.integrator.name
    import contextlib

    # --profile: jax.profiler trace over the whole render (the SIGPROF
    # sampling-profiler analog — XLA's per-op device lanes replace the
    # reference's per-category time histogram, stats.cpp:222)
    with (tlog.profile_to(args.profile) if args.profile
          else contextlib.nullcontext()):
        if name == "mlt":
            from tpupt.integrators.mlt import MLTRenderer

            mr = MLTRenderer(r)
            img = mr.render(mutations_per_pixel=max(spp * 8, 32),
                            verbose=not args.quiet)
            film = mr.film  # splat-backed Film (stats/writestats parity)
            r._spp_rendered = 1  # splats carry the final physical estimate
            render_s = time.time() - t0
        elif name == "sppm":
            from tpupt.integrators.sppm import SPPMRenderer

            sr_ = SPPMRenderer(r)
            img = sr_.render(n_iterations=max(spp, 4),
                             verbose=not args.quiet)
            film = sr_.film  # rgb-backed Film (stats/writestats parity)
            r._spp_rendered = 1
            render_s = time.time() - t0
        elif args.mesh and len(jax.devices()) > 1:
            from tpupt.parallel.mesh import ShardedRenderer, make_mesh

            sr = ShardedRenderer(scene, make_mesh(), base=r)
            film = sr.render(spp=spp, verbose=not args.quiet)
            jax.block_until_ready(film.rgb)
            render_s = time.time() - t0
            img = sr.image(film)
            r = sr.base  # stats/AOVs read through the base renderer
        else:
            film = r.render(spp=spp, verbose=not args.quiet)
            jax.block_until_ready(film.rgb)
            render_s = time.time() - t0
            img = r.image(film)
    out = args.outfile or os.path.splitext(
        os.path.basename(scene.film.filename))[0] + ".png"
    ext = os.path.splitext(out)[1].lower()
    if ext == ".png":
        imageio.write_png(out, img)
    elif ext == ".exr":
        imageio.write_exr(out, img)
    elif ext == ".pfm":
        imageio.write_pfm(out, img)
    else:
        imageio.write_png(out + ".png", img)
        out += ".png"

    n_rays = scene.film.xres * scene.film.yres * spp
    if not args.quiet:
        print(f"rendered {spp} spp in {render_s:.1f}s "
              f"({n_rays / max(render_s, 1e-9) / 1e6:.2f} M camera rays/s) -> {out}")
    if args.stats:
        print("Statistics:")
        print(f"  camera rays                     {n_rays}")
        if film is not None:  # mlt/sppm drive their own film (no AOVs)
            for k, v in r.aovs(film).items():
                print(f"  {k:30s}  mean/pixel {float(v.mean()):10.2f}")
        print(f"  Timings/Buildtime               {build_s:.2f} s")
        print(f"  Timings/Rendertime              {render_s:.2f} s")
    if args.dumptree and hasattr(r, "accel_nodes"):
        from tpupt.accel.kdbsp import dump_tree

        base_t = os.path.splitext(out)[0]
        dump_tree(r.accel_nodes, r.accel_dirs, f"{base_t}-tree.txt")
        if not args.quiet:
            print(f"wrote tree serialization to {base_t}-tree.txt")
    if args.writestats:
        base = os.path.splitext(out)[0]
        import numpy as np

        aovs = r.aovs(film) if film is not None else {}
        for k, v in aovs.items():
            np.savetxt(f"{base}.{k}.txt", v, fmt="%.2f")
        if aovs:
            # leaf-size histogram mean (WriteGeneralStatMapImage
            # leafNodeIntersectionMeanAmount, film.cpp:210-239): mean prim
            # count of the leaves each pixel's rays visited == total prims
            # in visited leaves / leaf visits (the per-(leaf,prim) test
            # counter IS that numerator). Closest-hit and shadow-ray
            # traversals are merged in the AOV channels (the reference
            # splits a -P variant).
            mean_amt = np.where(aovs["leaf_visits"] > 0,
                                aovs["prim_tests"]
                                / np.maximum(aovs["leaf_visits"], 1), 0.0)
            np.savetxt(f"{base}-leafNodeIntersectionMeanAmount.txt",
                       mean_amt, fmt="%.3f")
        if hasattr(r, "accel_nodes"):
            # node-type depth histograms next to the image
            # (GenericBSP::writeNodeTypeDepthMaps, genericBSP.h:132)
            from tpupt.accel.kdbsp import node_type_depth_maps

            for name, m in node_type_depth_maps(r.accel_nodes,
                                                r.accel_dirs).items():
                with open(f"{base}-{name}.txt", "w") as f:
                    for depth in sorted(m):
                        f.write(f"{depth} {m[depth]}\n")
        if not args.quiet:
            print(f"wrote per-pixel stat matrices to {base}.*.txt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
