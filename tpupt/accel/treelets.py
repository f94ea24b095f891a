"""Two-level wide-BVH partition for HBM-streamed traversal.

The single-level Pallas packet kernel (ops/traverse_pallas.py) requires the
whole node+prim table resident in VMEM (~12 MB), which caps it at killeroo-
class scenes. The reference traverses arbitrary scene sizes (bvh.cpp:354-397
walks nodes cached by the CPU memory hierarchy). The TPU answer is an
explicit two-level scheme:

  * the wide BVH is cut into *treelets* — subtrees whose serialized node
    block (<= TREELET_NODES rows) and prim block (<= TREELET_PRIMS rows)
    fit a fixed VMEM tile budget;
  * the *top tree* (everything above the cuts) stays VMEM-resident; its
    leaves are treelet references;
  * phase 1 bins each 1024-ray packet to the treelets it enters (with
    packet entry distance for front-to-back ordering);
  * phase 2 walks (packet, treelet) pairs on a Pallas grid whose
    scalar-prefetch index maps stream each pair's treelet node/prim blocks
    HBM->VMEM — Pallas double-buffers consecutive grid steps, so the DMA
    rides under the previous pair's traversal compute.

This module is the host-side partitioner; the kernels live in
ops/traverse_stream.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from tpupt.accel.bvh import META_EMPTY

TREELET_NODES = 512    # wide-node rows per treelet block (64 f32 each)
TREELET_PRIMS = 4096   # prim rows per treelet block (32 f32 each)
TREELET_LIST_MAX = 96  # per-packet treelet list capacity (phase 1 output)


@dataclass
class TreeletArrays:
    """Device-ready two-level tables (all numpy, ready for device_put)."""

    top_tiles: np.ndarray   # (Ntop, 8, 8) f32 — VMEM-resident top tree
    tl_nodes: np.ndarray    # (NT*TN, 128) f32 — node rows (64 data + pad)
    tl_prims: np.ndarray    # (NT*TP/4, 128) f32 — prim blocks, 4 rows/row
    n_treelets: int
    tn: int
    tp: int


def _decode_meta(wide_nodes: np.ndarray):
    meta = wide_nodes[:, 48:56].view(np.int32)
    is_int = meta >= 0
    is_empty = meta == META_EMPTY
    is_leaf = (~is_int) & (~is_empty)
    v = np.where(is_leaf, -meta - 1, 0)
    return meta, is_int, is_leaf, (v >> 6), (v & 63)


def _subtree_sizes(meta, is_int, leaf_count):
    """Per wide node: (#wide nodes, #prim rows) in its subtree. Children get
    larger ids than parents (collapse_to_wide assigns ids on discovery), so
    one reverse sweep suffices."""
    nw = len(meta)
    sub_nodes = np.ones(nw, np.int64)
    # leaf prim runs are padded to multiples of 4 in the packed block
    # (static-lane prim reads); account for that here so `fits` is exact
    sub_prims = ((leaf_count + 3) & ~3).sum(1).astype(np.int64)
    for i in range(nw - 1, -1, -1):
        for c in range(8):
            if is_int[i, c]:
                ch = meta[i, c]
                sub_nodes[i] += sub_nodes[ch]
                sub_prims[i] += sub_prims[ch]
    return sub_nodes, sub_prims


def build_treelets(wide_nodes: np.ndarray, prim_rows: np.ndarray,
                   tn: int = TREELET_NODES,
                   tp: int = TREELET_PRIMS) -> TreeletArrays:
    """Partition the wide BVH (collapse_to_wide rows) into a top tree +
    treelet blocks.

    Cut rule: walking down from the root, an interior child becomes a
    treelet root as soon as its subtree fits (sub_nodes <= tn AND
    sub_prims <= tp); a direct prim-leaf slot of a top node becomes a
    singleton treelet (top-tree leaves are ALWAYS treelet refs, so phase 2
    is the only prim-testing stage). Every wide leaf holds <= 63 prims,
    so the recursion always terminates with fitting treelets.

    Top-tile meta encoding (col 6/7 of each (8,8) child tile):
      col6 > 0  : interior top child id
      col6 == 0 : empty slot
      col6 < 0  : treelet ref, tid = col7
    Treelet node tiles use the standard single-level encoding with
    treelet-local node ids and treelet-local prim offsets."""
    assert tp >= 128 and tn >= 1
    meta, is_int, is_leaf, leaf_first, leaf_count = _decode_meta(wide_nodes)
    sub_nodes, sub_prims = _subtree_sizes(meta, is_int, leaf_count)
    if sub_nodes[0] <= tn and sub_prims[0] <= tp - 64:
        raise ValueError("scene fits a single treelet; use the single-level "
                         "kernel instead")

    # 64 spare prim rows: the leaf loop reads up to max_leaf rows past a
    # leaf's first row regardless of its count (masked), so the last leaf
    # needs in-block slack
    fits = (sub_nodes <= tn) & (sub_prims <= tp - 64)

    # ---- pass 1: assign top ids (BFS) and treelet roots ----
    top_ids: list[int] = []
    top_remap: dict[int, int] = {}
    # treelet spec: ('sub', wide_root) or ('leaf', first, count, lo_hi6)
    treelets: list[tuple] = []
    slot_tl: dict[tuple, int] = {}  # (wide_id, c) -> treelet id
    queue = [0]
    qi = 0
    while qi < len(queue):
        i = queue[qi]
        qi += 1
        top_remap[i] = len(top_ids)
        top_ids.append(i)
        for c in range(8):
            if is_int[i, c]:
                ch = int(meta[i, c])
                if fits[ch]:
                    slot_tl[(i, c)] = len(treelets)
                    treelets.append(("sub", ch))
                else:
                    queue.append(ch)
            elif is_leaf[i, c]:
                slot_tl[(i, c)] = len(treelets)
                treelets.append(("leaf", int(leaf_first[i, c]),
                                 int(leaf_count[i, c]),
                                 wide_nodes[i, c * 6: c * 6 + 6].copy()))

    # ---- pass 2: emit top tiles ----
    n_top = len(top_ids)
    top_tiles = np.zeros((n_top, 8, 8), np.float32)
    for new_i, i in enumerate(top_ids):
        for c in range(8):
            top_tiles[new_i, c, 0:6] = wide_nodes[i, c * 6: c * 6 + 6]
            if (i, c) in slot_tl:
                top_tiles[new_i, c, 6] = -1.0
                top_tiles[new_i, c, 7] = float(slot_tl[(i, c)])
            elif is_int[i, c]:
                top_tiles[new_i, c, 6] = float(top_remap[int(meta[i, c])])
            # else: empty (col6 stays 0; bounds are inf/-inf, never hit)

    # ---- pass 3: serialize each treelet ----
    nt = len(treelets)
    tl_nodes = np.zeros((nt, tn, 64), np.float32)
    tl_prims = np.zeros((nt, tp, 32), np.float32)
    for tid, spec in enumerate(treelets):
        if spec[0] == "leaf":
            _, first, count, lohi = spec
            row = np.zeros(64, np.float32)
            m = np.full(8, META_EMPTY, np.int32)
            row[0:6] = lohi
            m[0] = -(0 * 64 + count) - 1
            for c in range(1, 8):
                row[c * 6: c * 6 + 3] = np.inf
                row[c * 6 + 3: c * 6 + 6] = -np.inf
            row[48:56] = m.view(np.float32)
            tl_nodes[tid, 0] = row
            tl_prims[tid, :count] = prim_rows[first: first + count]
            continue
        root = spec[1]
        # BFS local id assignment
        local = {root: 0}
        order = [root]
        qi = 0
        while qi < len(order):
            i = order[qi]
            qi += 1
            for c in range(8):
                if is_int[i, c]:
                    ch = int(meta[i, c])
                    local[ch] = len(order)
                    order.append(ch)
        assert len(order) <= tn
        pcur = 0
        for li, i in enumerate(order):
            row = wide_nodes[i].copy()
            m = np.full(8, META_EMPTY, np.int32)
            for c in range(8):
                if is_int[i, c]:
                    m[c] = local[int(meta[i, c])]
                elif is_leaf[i, c]:
                    f, cnt = int(leaf_first[i, c]), int(leaf_count[i, c])
                    pcur = (pcur + 3) & ~3  # 4-aligned leaf starts
                    tl_prims[tid, pcur: pcur + cnt] = prim_rows[f: f + cnt]
                    m[c] = -(pcur * 64 + cnt) - 1
                    pcur += cnt
            row[48:56] = m.view(np.float32)
            tl_nodes[tid, li] = row
        assert pcur <= tp - 64

    # treelet node rows -> the (8,8)-tile float encoding the kernel
    # reads, stored as 128-lane rows (64 data floats + 64 pad): Mosaic
    # needs HBM DMA slices lane-aligned to 128 AND static lane offsets on
    # scalar VMEM loads, so node ids (dynamic) index sublanes only. Prim
    # rows pack 4 per 128-lane row — their lane offset comes from the
    # STATIC leaf-loop index, valid because leaf starts are 4-aligned.
    from tpupt.scene.device import nodes_to_tiles

    tl_tiles = np.zeros((nt * tn, 128), np.float32)
    for tid in range(nt):
        tl_tiles[tid * tn: (tid + 1) * tn, :64] = (
            nodes_to_tiles(tl_nodes[tid]).reshape(tn, 64))

    return TreeletArrays(top_tiles=top_tiles,
                         tl_nodes=tl_tiles,
                         tl_prims=tl_prims.reshape(nt * tp // 4, 128),
                         n_treelets=nt, tn=tn, tp=tp)
