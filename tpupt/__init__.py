"""tpupt — a TPU-native differentiable path tracer.

A brand-new framework with the capabilities of pbrt-v3 (as forked in
jhoobergs/Thesis-pbrt-v3), re-architected for TPUs: flat SoA scene tensors,
wavefront ray batches with masked depth iteration, XLA/Pallas intersection
kernels, stateless low-discrepancy samplers, scatter-add film, and a fully
differentiable light-transport estimator, shardable over `jax.sharding.Mesh`.

Layer map (cf. SURVEY.md §1 of this repo):
  core/        L0-L2: math, transforms, spectrum, RNG, low-discrepancy, sampling
  scene/       L6: .pbrt tokenizer + state-machine API -> FlatScene tensors
  accel/       L4: BVH/kd/BSP builders (host) + flat node tensors + traversal
  ops/         Pallas TPU kernels for the hot paths
  shapes/      triangle / sphere / quadric intersection math
  cameras/ samplers/ filters/ materials/ textures/ lights/ media/  L3/L4 tables
  integrators/ L5: wavefront path tracing, direct lighting, AO
  film/        filter-weighted scatter-add film + AOV telemetry
  parallel/    L1/L8: device-mesh sharding, film/grad collectives
  utils/       image I/O (EXR/PFM/PNG), stats registry
"""

__version__ = "0.1.0"
