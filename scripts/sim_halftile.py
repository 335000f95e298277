"""Offline estimate: sub-tile granularity for the cluster-enter predicate.

The mesh kernel enters a cluster's 64-triangle loop if ANY of the tile's
16x128 = 2048 lanes slab-hits it, then pays the Moller-Trumbore sweep at
full tile width. After the fused sort, lanes are ordered by the sort key,
so an (8,128) half-tile is a contiguous key range — strictly more coherent
than the tile. This script counts, for secondary-bounce rays under the
shipped key, how much triangle-loop vector work a half-/quarter-tile
predicate would skip, and how many extra scalar branches it would cost.

Vector-work model: an entered cluster at granularity g costs
(entered subtiles / subtiles-per-tile) x 64 tri-tests of full tile width.
Scalar-branch model: one `pl.when` drain (~450 cycles) per subtile test on
the cluster-enter path (the batched box sweeps above it are unchanged).
"""
import os
import sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from cosc_4397_pathtracing_raytracing_project_tpu.scene import Scene, load_scene_desc
from cosc_4397_pathtracing_raytracing_project_tpu.ops import bvh as bvh_mod
from cosc_4397_pathtracing_raytracing_project_tpu.ops.pallas import mesh_kernel as mk

rng = np.random.default_rng(0)
desc = load_scene_desc(os.path.join(os.path.dirname(__file__), "..", "scenes", "mesh1080p.txt"))
desc.camera.resolution = (1920, 1080)
scene = Scene.from_desc(desc)
v0 = np.asarray(scene.triangles.v0); e1 = np.asarray(scene.triangles.e1); e2 = np.asarray(scene.triangles.e2)
tmin = np.minimum(np.minimum(v0, v0+e1), v0+e2); tmax = np.maximum(np.maximum(v0, v0+e1), v0+e2)
bvh = bvh_mod.build_bvh(tmin, tmax, leaf_size=8)
o = bvh.order
clusters, membership = mk.treelet_cut(bvh, mk.CLUSTER)
rows, aabbs = mk.pack_clusters(v0[o], e1[o], e2[o], None, clusters, mk.CLUSTER)
sc_rows, cl_rows, S = mk.build_visit_tables(aabbs, membership)
sc_rows = sc_rows.reshape(8, S, 8); cl_rows = cl_rows.reshape(8, S, mk.SUPER, 8)
print(f"{len(clusters)} clusters, {S} superclusters", file=sys.stderr)

lo = tmin.min(0); hi = tmax.max(0)
ext = hi - lo

N = 61_440  # 30 tiles of 2048
ti = rng.integers(0, len(v0), N)
u = rng.random(N); v = rng.random(N)
fl = u + v > 1; u[fl] = 1 - u[fl]; v[fl] = 1 - v[fl]
orig = v0[ti] + u[:, None]*e1[ti] + v[:, None]*e2[ti]
n = np.cross(e1[ti], e2[ti]); n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
n *= np.where(rng.random(N) < 0.5, 1.0, -1.0)[:, None]
r1, r2 = rng.random(N), rng.random(N)
st = np.sqrt(r1); ph = 2*np.pi*r2
t1 = np.cross(n, np.where(np.abs(n[:, :1]) < 0.9, [[1,0,0]], [[0,1,0]]))
t1 /= np.maximum(np.linalg.norm(t1, axis=1, keepdims=True), 1e-12)
t2 = np.cross(n, t1)
d = (t1*(st*np.cos(ph))[:, None] + t2*(st*np.sin(ph))[:, None]
     + n*np.sqrt(np.maximum(1-r1, 0))[:, None])
orig = orig + n*1e-3

def nearest_t(o_, d_):
    best = np.full(len(o_), 1e30, np.float32)
    for r0 in range(0, len(o_), 8192):
      rs = slice(r0, min(r0+8192, len(o_)))
      ob, db = o_[rs], d_[rs]
      for c0 in range(0, len(v0), 2048):
        sl = slice(c0, min(c0+2048, len(v0)))
        p = np.cross(db[:, None, :], e2[None, sl, :])
        det = np.einsum('nkj,kj->nk', p, e1[sl])
        inv = np.where(np.abs(det) > 1e-9, 1.0/np.where(det == 0, 1, det), 0.0)
        tv = ob[:, None, :] - v0[None, sl, :]
        uu = np.einsum('nkj,nkj->nk', tv, p) * inv
        q = np.cross(tv, e1[None, sl, :])
        vv = np.einsum('nj,nkj->nk', db, q) * inv
        tt = np.einsum('kj,nkj->nk', e2[sl], q) * inv
        ok = (np.abs(det) > 1e-9) & (uu >= 0) & (vv >= 0) & (uu+vv <= 1) & (tt > 1e-4)
        tt = np.where(ok, tt, 1e30)
        best[rs] = np.minimum(best[rs], tt.min(axis=1))
    return best

t0 = time.time()
bt = nearest_t(orig.astype(np.float32), d.astype(np.float32))
print(f"nearest-hit ref in {time.time()-t0:.1f}s; hit frac {np.mean(bt<1e30):.2f}", file=sys.stderr)

TILE = mk.TILE_ROWS * 128

# shipped key: origin 2x2x2 cells, direction octant minor
oct_ = (d[:,0] > 0).astype(np.int64) + 2*(d[:,1] > 0) + 4*(d[:,2] > 0)
cell_id = np.zeros(N, np.int64)
mult = 1
for a in range(3):
    c = np.clip(((orig[:,a]-lo[a]) / ext[a] * 2).astype(np.int64), 0, 1)
    cell_id = cell_id + c * mult
    mult <<= 1
key = cell_id * 8 + oct_

order = np.argsort(key, kind="stable")
o_, d_, bt_ = orig[order], d[order], bt[order]
n_tiles = N // TILE

DRAIN = 450.0     # cycles per pl.when vector->scalar pipeline drain
TRI_CYCLES = 80.0 # cycles per triangle test at (16,128) width (~40 ops x 2)

for name, sub in [("tile (16,128)", 1), ("half (8,128)", 2), ("quarter (4,128)", 4)]:
    cl_in = 0          # clusters entered at tile level (box sweeps unchanged)
    sub_in = 0         # subtile x cluster entries (vector work units)
    branches = 0       # extra pl.when drains on the enter path
    for t in range(n_tiles):
        sl = slice(t*TILE, (t+1)*TILE)
        to, td, tb = o_[sl], d_[sl], bt_[sl]
        mx = np.sum(np.where(td[:,0] > 0, 1, -1)); my = np.sum(np.where(td[:,1] > 0, 1, -1)); mz = np.sum(np.where(td[:,2] > 0, 1, -1))
        oc = int(mx > 0) + 2*int(my > 0) + 4*int(mz > 0)
        inv = 1.0 / np.where(td == 0, 1e-12, td)
        def useful(boxes):  # [K,8] -> per-(ray,box) bool
            t0s = (boxes[None,:,0:3] - to[:,None,:]) * inv[:,None,:]
            t1s = (boxes[None,:,3:6] - to[:,None,:]) * inv[:,None,:]
            lo_ = np.minimum(t0s, t1s).max(axis=2)
            hi_ = np.maximum(t0s, t1s).min(axis=2)
            return (hi_ >= np.maximum(lo_, 0)) & (lo_ < tb[:,None])
        scu = useful(sc_rows[oc]).any(axis=0)
        for s in np.nonzero(scu)[0]:
            per_ray = useful(cl_rows[oc, s])              # [TILE, SUPER]
            ent = per_ray.any(axis=0)                     # tile-level enter
            cl_in += int(ent.sum())
            per_sub = per_ray.reshape(sub, TILE//sub, -1).any(axis=1)  # [sub, SUPER]
            sub_in += int(per_sub[:, ent].sum())
            branches += int(ent.sum()) * (sub if sub > 1 else 0)
    vec = sub_in / sub * TRI_CYCLES * mk.CLUSTER / n_tiles
    br = branches * DRAIN / n_tiles
    base_ref = cl_in * TRI_CYCLES * mk.CLUSTER / n_tiles
    print(f"{name:16s} clusters/tile {cl_in/n_tiles:7.1f}  subtile-enters/cluster "
          f"{sub_in/max(cl_in,1):4.2f}/{sub}  tri-loop cycles/tile {vec:9.0f}"
          f"  +branch cycles {br:7.0f}  total {vec+br:9.0f}  ({(vec+br)/base_ref*100:5.1f}% of tile-level)")
