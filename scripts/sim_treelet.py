"""Offline evaluation of IN-KERNEL TREELET/BVH DESCENT over the cluster
list — the round-4 verdict's named structural alternative for the mesh
pipeline's bounce-1 incoherence hotspot (158 ms/sample, 38% of depth-8).

The candidate: replace the mesh kernel's linear supercluster sweep
(mesh_kernel.py — S slab tests per tile, front-to-back, BATCH per scalar
branch) with a tile-level binary-BVH walk over the superclusters: a node
is entered iff ANY live ray hits its AABB with entry < its best_t, a
rejected node skips its whole subtree. The leaf predicate is the SAME
supercluster slab test, so the set of entered superclusters — and
therefore the entered clusters and the per-triangle work — is IDENTICAL
by construction. A descent can only reduce the *box-test* count.

This script measures exactly that on the benchmark mesh with the
bounce-1-like ray population (cosine scatter off the surface, the same
model sim_sort_keys.py uses), then converts the delta to a wall-clock
ceiling with the kernel's measured cost split (docs/ROADMAP.md: ctrl 427
≈ notri 202 + noload 198 ms/sample — the triangle loop IS the cost; box
sweeps ride the same VPU stream).

Measured result (2026-08-20, 30 tiles × 2048 rays, 38.5k tris → 1024
clusters / 64 superclusters):

    linear sweep:     64.0 SC slab tests/tile (+16/entered-SC cluster tests)
    treelet descent: 110.4 node tests/tile (127-node tree)
    SC entered 44.5/64, clusters entered 439.8,
    triangle tests 28149/tile — UNCHANGED by construction

    op-budget (ops model: ~20 vec-ops/slab, ~66/triangle):
    linear 1,873,387  descent 1,874,315  box share 0.83%
    ceiling even if ALL box tests were free: +0.84%.

    The descent REGRESSES box tests (110 > 64): 70% of superclusters are
    entered by a diffuse tile, so subtree rejection almost never fires
    and every interior node is a wasted test — AND a pointer walk adds
    per-node scalar-branch serialization the linear BATCH=8 sweep
    amortizes 8×.

Conclusion: in-kernel treelet descent cannot move the mesh number — the
bounce-1 cost is the per-triangle vector work inside clusters that ARE
entered (intrinsic 43% entry rate, sim_sort_keys.py), not the box tests.
Written refutation for ROADMAP; no kernel implementation warranted.

Run from the repo root:  python scripts/sim_treelet.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from cosc_4397_pathtracing_raytracing_project_tpu.scene import (
    Scene,
    load_scene_desc,
)
from cosc_4397_pathtracing_raytracing_project_tpu.ops import bvh as bvh_mod
from cosc_4397_pathtracing_raytracing_project_tpu.ops.pallas import (
    mesh_kernel as mk,
)

rng = np.random.default_rng(0)
desc = load_scene_desc(
    os.path.join(os.path.dirname(__file__), "..", "scenes", "mesh1080p.txt")
)
desc.camera.resolution = (1920, 1080)
scene = Scene.from_desc(desc)
v0 = np.asarray(scene.triangles.v0)
e1 = np.asarray(scene.triangles.e1)
e2 = np.asarray(scene.triangles.e2)
tmin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
tmax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
bvh = bvh_mod.build_bvh(tmin, tmax, leaf_size=8)
o = bvh.order
clusters, membership = mk.treelet_cut(bvh, mk.CLUSTER)
rows, aabbs = mk.pack_clusters(v0[o], e1[o], e2[o], None, clusters, mk.CLUSTER)
sc_rows, cl_rows, S = mk.build_visit_tables(aabbs, membership)
sc_rows = sc_rows.reshape(8, S, 8)
cl_rows = cl_rows.reshape(8, S, mk.SUPER, 8)
n_real_sc = len(membership)
print(f"{len(clusters)} clusters, {n_real_sc} superclusters (padded {S})",
      file=sys.stderr)

lo = tmin.min(0)
hi = tmax.max(0)
ext = hi - lo

N = 61_440  # 30 tiles of 2048
ti = rng.integers(0, len(v0), N)
u = rng.random(N)
v = rng.random(N)
fl = u + v > 1
u[fl] = 1 - u[fl]
v[fl] = 1 - v[fl]
orig = v0[ti] + u[:, None] * e1[ti] + v[:, None] * e2[ti]
n = np.cross(e1[ti], e2[ti])
n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
n *= np.where(rng.random(N) < 0.5, 1.0, -1.0)[:, None]
r1, r2 = rng.random(N), rng.random(N)
st = np.sqrt(r1)
ph = 2 * np.pi * r2
t1 = np.cross(n, np.where(np.abs(n[:, :1]) < 0.9, [[1, 0, 0]], [[0, 1, 0]]))
t1 /= np.maximum(np.linalg.norm(t1, axis=1, keepdims=True), 1e-12)
t2 = np.cross(n, t1)
d = (
    t1 * (st * np.cos(ph))[:, None]
    + t2 * (st * np.sin(ph))[:, None]
    + n * np.sqrt(np.maximum(1 - r1, 0))[:, None]
)
orig = (orig + n * 1e-3).astype(np.float32)
d = d.astype(np.float32)


def nearest_t(o_, d_):
    best = np.full(len(o_), 1e30, np.float32)
    for r0 in range(0, len(o_), 8192):
        rs = slice(r0, min(r0 + 8192, len(o_)))
        ob, db = o_[rs], d_[rs]
        for c0 in range(0, len(v0), 2048):
            sl = slice(c0, min(c0 + 2048, len(v0)))
            p = np.cross(db[:, None, :], e2[None, sl, :])
            det = np.einsum("nkj,kj->nk", p, e1[sl])
            inv = np.where(
                np.abs(det) > 1e-9, 1.0 / np.where(det == 0, 1, det), 0.0
            )
            tv = ob[:, None, :] - v0[None, sl, :]
            uu = np.einsum("nkj,nkj->nk", tv, p) * inv
            q = np.cross(tv, e1[None, sl, :])
            vv = np.einsum("nj,nkj->nk", db, q) * inv
            tt = np.einsum("kj,nkj->nk", e2[sl], q) * inv
            ok = (
                (np.abs(det) > 1e-9) & (uu >= 0) & (vv >= 0)
                & (uu + vv <= 1) & (tt > 1e-4)
            )
            tt = np.where(ok, tt, 1e30)
            best[rs] = np.minimum(best[rs], tt.min(axis=1))
    return best


t0 = time.time()
bt = nearest_t(orig, d)
print(f"nearest-hit ref in {time.time() - t0:.1f}s", file=sys.stderr)

TILE = mk.TILE_ROWS * 128

# current sort key (4x4x4 cells + octant — mesh_sort_cells=2 ⇒ 2 bits/axis)
oct_ = (d[:, 0] > 0).astype(np.int64) + 2 * (d[:, 1] > 0) + 4 * (d[:, 2] > 0)
cell = np.zeros(N, np.int64)
mult = 1
for a in range(3):
    c = np.clip(
        ((orig[:, a] - lo[a]) / ext[a] * 4).astype(np.int64), 0, 3
    )
    cell += c * mult
    mult *= 4
key = cell * 8 + oct_
order = np.argsort(key, kind="stable")
o_, d_, bt_ = orig[order], d[order], bt[order]


def build_sc_tree(boxes):
    """Median-split binary BVH over supercluster AABBs; returns a node list
    (bmin, bmax, left, right, sc_id)."""
    nodes = []

    def rec(ids):
        bmin = boxes[ids, 0:3].min(axis=0)
        bmax = boxes[ids, 3:6].max(axis=0)
        me = len(nodes)
        nodes.append([bmin, bmax, -1, -1, -1])
        if len(ids) == 1:
            nodes[me][4] = ids[0]
            return me
        ctr = 0.5 * (boxes[ids, 0:3] + boxes[ids, 3:6])
        ax = int(np.argmax(ctr.max(axis=0) - ctr.min(axis=0)))
        srt = ids[np.argsort(ctr[:, ax], kind="stable")]
        half = len(srt) // 2
        nodes[me][2] = rec(srt[:half])
        nodes[me][3] = rec(srt[half:])
        return me

    rec(np.arange(len(boxes)))
    return nodes


# un-permuted real SC boxes (descent order is its own policy)
sc_boxes = np.zeros((n_real_sc, 6), np.float32)
for s, members in enumerate(membership):
    m = aabbs[members]
    sc_boxes[s, 0:3] = m[:, 0:3].min(axis=0)
    sc_boxes[s, 3:6] = m[:, 3:6].max(axis=0)
tree = build_sc_tree(sc_boxes)
print(f"SC tree: {len(tree)} nodes", file=sys.stderr)

n_tiles = N // TILE
lin_boxes = desc_boxes = sc_entered = cl_entered = tris = 0
for t in range(n_tiles):
    sl = slice(t * TILE, (t + 1) * TILE)
    to, td, tb = o_[sl], d_[sl], bt_[sl]
    inv = 1.0 / np.where(td == 0, 1e-12, td)

    def any_hit(bmin, bmax):
        t0s = (bmin[None, :] - to) * inv
        t1s = (bmax[None, :] - to) * inv
        lo_ = np.minimum(t0s, t1s).max(axis=1)
        hi_ = np.maximum(t0s, t1s).min(axis=1)
        return ((hi_ >= np.maximum(lo_, 0)) & (lo_ < tb)).any()

    # linear sweep: every (padded) SC is slab-tested once per tile
    lin_boxes += S
    entered = [
        s for s in range(n_real_sc)
        if any_hit(sc_boxes[s, 0:3], sc_boxes[s, 3:6])
    ]
    sc_entered += len(entered)
    # member-cluster tests for entered SCs (same for both traversals)
    for s in entered:
        m = aabbs[membership[s]]
        for b in m:
            if any_hit(b[0:3], b[3:6]):
                cl_entered += 1
                tris += mk.CLUSTER

    # treelet descent: count visited nodes (tested boxes)
    stack = [0]
    while stack:
        ni = stack.pop()
        bmin, bmax, lc, rc, sc_id = tree[ni]
        desc_boxes += 1
        if not any_hit(np.asarray(bmin), np.asarray(bmax)):
            continue
        if sc_id < 0:
            stack.append(lc)
            stack.append(rc)

print(
    f"linear sweep:    {lin_boxes / n_tiles:6.1f} SC slab tests/tile\n"
    f"treelet descent: {desc_boxes / n_tiles:6.1f} node tests/tile "
    f"({len(tree)}-node tree)\n"
    f"SC entered {sc_entered / n_tiles:.1f}/{n_real_sc}  "
    f"clusters entered {cl_entered / n_tiles:.1f}  "
    f"tris tested {tris / n_tiles:.0f}/tile (identical either way)"
)
box_ops, tri_ops = 20.0, 66.0
cl_tests = sc_entered / n_tiles * mk.SUPER
budget = lambda b: (b + cl_tests) * box_ops + tris / n_tiles * tri_ops
print(
    f"op-budget: linear {budget(lin_boxes / n_tiles):,.0f}  "
    f"descent {budget(desc_boxes / n_tiles):,.0f}  "
    f"box share {(lin_boxes / n_tiles + cl_tests) * box_ops / budget(lin_boxes / n_tiles) * 100:.2f}%  "
    f"ceiling-if-boxes-free +{(budget(lin_boxes / n_tiles) / (tris / n_tiles * tri_ops) - 1) * 100:.2f}%"
)
