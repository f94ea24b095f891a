"""Two-level HBM-streamed traversal: partition invariants + interpret-mode
equivalence of the streamed pallas path vs the XLA wide walker (the
bvh.cpp:354 'size-oblivious traversal' parity check). Tiny treelet budgets
force a real multi-treelet partition on a small scene."""

import jax.numpy as jnp
import numpy as np
import pytest

# slow tier: interpret-mode two-level pallas equivalences
pytestmark = pytest.mark.slow

from tpupt.accel import traverse as trav
from tpupt.accel.treelets import build_treelets
from tpupt.ops.traverse_stream import intersect_packets_streamed
from tpupt.scene.device import upload
from tpupt.scene.flatten import flatten
from tpupt.scene.loader import parse_string

BUDGET = (32, 512)


def _cluster_scene(n_tris=2500, n_clusters=24, seed=0):
    """Random triangle clusters — deep BVH with well-separated subtrees."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-10, 10, (n_clusters, 3))
    ci = rng.integers(0, n_clusters, n_tris)
    base = centers[ci] + rng.normal(0, 0.6, (n_tris, 3))
    e1 = rng.normal(0, 0.25, (n_tris, 3))
    e2 = rng.normal(0, 0.25, (n_tris, 3))
    pts = np.concatenate([base, base + e1, base + e2], axis=1).reshape(-1)
    idx = np.arange(3 * n_tris)
    p_str = " ".join(f"{v:.5f}" for v in pts)
    i_str = " ".join(str(i) for i in idx)
    txt = f"""
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Integrator "path"
WorldBegin
Material "matte" "rgb Kd" [0.5 0.5 0.5]
Shape "trianglemesh" "point P" [{p_str}] "integer indices" [{i_str}]
WorldEnd
"""
    return upload(flatten(parse_string(txt)), two_level=True,
                  treelet_budget=BUDGET)


@pytest.fixture(scope="module")
def two_level():
    ds, st = _cluster_scene()
    assert st.two_level and st.n_treelets >= 4
    return ds, st


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-14, 14, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.full(n, jnp.inf)


def test_treelet_partition_covers_all_prims(two_level):
    ds, st = two_level
    tla = build_treelets(np.asarray(ds.wide_nodes), np.asarray(ds.prim_rows),
                         *BUDGET)
    # every global prim id appears exactly once across treelet prim blocks
    rows = tla.tl_prims.reshape(tla.n_treelets, tla.tp, 32)
    gids = []
    for tid in range(tla.n_treelets):
        live = rows[tid].any(axis=1)
        gids.append(rows[tid].view(np.int32)[live, 16])
    gids = np.sort(np.concatenate(gids))
    assert len(gids) == st.n_tris
    assert (gids == np.arange(st.n_tris)).all()


def test_streamed_matches_wide_closest(two_level):
    ds, st = two_level
    o, d, tmax = _rays(2048)
    hit_s, stats_s = intersect_packets_streamed(ds, st, o, d, tmax,
                                                interpret=True)
    hit_w, _ = trav.intersect_wide(ds, st, o, d, tmax)
    assert bool(jnp.any(hit_w.valid)), "degenerate test: no hits at all"
    np.testing.assert_array_equal(np.asarray(hit_s.valid),
                                  np.asarray(hit_w.valid))
    v = np.asarray(hit_w.valid)
    np.testing.assert_allclose(np.asarray(hit_s.t)[v],
                               np.asarray(hit_w.t)[v], rtol=2e-4, atol=1e-5)
    same = np.asarray(hit_s.prim)[v] == np.asarray(hit_w.prim)[v]
    assert same.mean() > 0.99  # ties only
    tri = v & (np.asarray(hit_s.prim) == np.asarray(hit_w.prim))
    np.testing.assert_allclose(np.asarray(hit_s.b1)[tri],
                               np.asarray(hit_w.b1)[tri], atol=2e-3)
    # no phase-1 list overflow on this scene, and real traversal work done
    assert int(jnp.max(stats_s.truncated)) == 0
    assert int(jnp.max(stats_s.node_visits)) > 0
    assert int(jnp.max(stats_s.prim_tests)) > 0


def test_streamed_matches_wide_anyhit(two_level):
    ds, st = two_level
    o, d, tmax = _rays(1024, seed=7)
    hit_s, _ = intersect_packets_streamed(ds, st, o, d, tmax, any_hit=True,
                                          interpret=True)
    occ_w, _ = trav.intersect_p(ds, st, o, d, tmax)
    np.testing.assert_array_equal(np.asarray(hit_s.valid), np.asarray(occ_w))


def test_streamed_respects_tmax(two_level):
    ds, st = two_level
    o, d, _ = _rays(1024, seed=3)
    hit_inf, _ = intersect_packets_streamed(
        ds, st, o, d, jnp.full(1024, jnp.inf), interpret=True)
    # clip tmax below each hit: those rays must now miss
    t = np.asarray(hit_inf.t)
    v = np.asarray(hit_inf.valid)
    tmax = jnp.asarray(np.where(v, t * 0.5, 1e8).astype(np.float32))
    hit_c, _ = intersect_packets_streamed(ds, st, o, d, tmax, interpret=True)
    assert not bool(jnp.any(hit_c.valid & jnp.asarray(v)))


def test_dead_packets_skip(two_level):
    ds, st = two_level
    o, d, _ = _rays(1024, seed=5)
    hit, stats = intersect_packets_streamed(
        ds, st, o, d, jnp.zeros(1024), interpret=True)
    assert not bool(jnp.any(hit.valid))
    assert int(jnp.max(stats.prim_tests)) == 0


# ------------------- treelet-major re-queue (ops/traverse_requeue) ----------


def test_requeue_matches_wide_closest(two_level):
    from tpupt.ops.traverse_requeue import intersect_packets_requeue

    ds, st = two_level
    o, d, tmax = _rays(2048)
    hit_r, stats_r = intersect_packets_requeue(ds, st, o, d, tmax,
                                               interpret=True, r_list=8)
    hit_w, _ = trav.intersect_wide(ds, st, o, d, tmax)
    assert bool(jnp.any(hit_w.valid))
    np.testing.assert_array_equal(np.asarray(hit_r.valid),
                                  np.asarray(hit_w.valid))
    v = np.asarray(hit_w.valid)
    np.testing.assert_allclose(np.asarray(hit_r.t)[v],
                               np.asarray(hit_w.t)[v], rtol=2e-4, atol=1e-5)
    same = np.asarray(hit_r.prim)[v] == np.asarray(hit_w.prim)[v]
    assert same.mean() > 0.99
    tri = v & (np.asarray(hit_r.prim) == np.asarray(hit_w.prim))
    np.testing.assert_allclose(np.asarray(hit_r.b1)[tri],
                               np.asarray(hit_w.b1)[tri], atol=2e-3)
    assert int(jnp.max(stats_r.truncated)) == 0
    assert int(jnp.max(stats_r.node_visits)) > 0
    assert int(jnp.max(stats_r.prim_tests)) > 0


def test_requeue_matches_wide_anyhit(two_level):
    from tpupt.ops.traverse_requeue import intersect_packets_requeue

    ds, st = two_level
    o, d, tmax = _rays(1024, seed=7)
    hit_r, _ = intersect_packets_requeue(ds, st, o, d, tmax, any_hit=True,
                                         interpret=True, r_list=8)
    occ_w, _ = trav.intersect_p(ds, st, o, d, tmax)
    np.testing.assert_array_equal(np.asarray(hit_r.valid), np.asarray(occ_w))


def test_requeue_respects_tmax_and_dead(two_level):
    from tpupt.ops.traverse_requeue import intersect_packets_requeue

    ds, st = two_level
    o, d, _ = _rays(1024, seed=3)
    hit_inf, _ = intersect_packets_requeue(
        ds, st, o, d, jnp.full(1024, jnp.inf), interpret=True, r_list=8)
    t = np.asarray(hit_inf.t)
    v = np.asarray(hit_inf.valid)
    tmax = jnp.asarray(np.where(v, t * 0.5, 1e8).astype(np.float32))
    hit_c, _ = intersect_packets_requeue(ds, st, o, d, tmax, interpret=True, r_list=8)
    assert not bool(jnp.any(hit_c.valid & jnp.asarray(v)))
    hit_0, stats_0 = intersect_packets_requeue(
        ds, st, o, d, jnp.zeros(1024), interpret=True, r_list=8)
    assert not bool(jnp.any(hit_0.valid))
    assert int(jnp.max(stats_0.prim_tests)) == 0


def test_requeue_overflow_falls_back_exactly(two_level):
    """A tiny per-ray list capacity (r_list=2 on a scene with >= 4
    treelets) overflows for many rays; those rays must be re-traced
    through the streamed fallback and still match the wide walker
    EXACTLY — truncation never loses hits."""
    from tpupt.ops.traverse_requeue import intersect_packets_requeue

    ds, st = two_level
    o, d, tmax = _rays(2048, seed=11)
    hit_r, _ = intersect_packets_requeue(ds, st, o, d, tmax,
                                         interpret=True, r_list=2)
    hit_w, _ = trav.intersect_wide(ds, st, o, d, tmax)
    v = np.asarray(hit_w.valid)
    np.testing.assert_array_equal(np.asarray(hit_r.valid), v)
    np.testing.assert_allclose(np.asarray(hit_r.t)[v],
                               np.asarray(hit_w.t)[v], rtol=2e-4, atol=1e-5)
