"""Offline culling-efficiency simulation for the mesh sort key (CPU-only).

Measured on mesh1080p (38.5k tris, 1024 clusters / 64 superclusters),
secondary-bounce rays, 30 tiles of 2048 (2026-08-17):

    current 4x4x4+oct      SC/tile 44.5  clusters/tile 440  tris/tile 28149
    8x4x4 longest axis     SC/tile 43.6  clusters/tile 430  tris/tile 27509
    8x8x8+oct (12bit)      SC/tile 47.9  clusters/tile 474  tris/tile 30310
    octant-major 4x4x4     SC/tile 48.0  clusters/tile 527  tris/tile 33700
    16x16x16+oct           SC/tile 47.8  clusters/tile 487  tris/tile 31147

Direction-resolution sweep (2026-08-20 — the round-4 verdict's
"bounce-1-specific reorder" candidate; every earlier variant refined only
the ORIGIN grid):

    4x4x4+oct+domaxis      SC/tile 44.0  clusters/tile 437  tris/tile 27968
    4x4x4+oct+dir2b        SC/tile 44.1  clusters/tile 432  tris/tile 27676
    2x2x2+oct+dir2b        SC/tile 42.0  clusters/tile 463  tris/tile 29649
    2x2x2+oct+dir3b        SC/tile 41.9  clusters/tile 461  tris/tile 29521
    dir-major oct+dir2b    SC/tile 47.7  clusters/tile 525  tris/tile 33611

Conclusion: the shipped 9-bit key is within 2% of the best variant in
BOTH families — finer cells fragment buckets below tile size, and finer
direction bins (sub-octant quantization, up to 512 direction buckets)
buy at most 1.7% fewer triangle tests before the same fragmentation
kicks in. Diffuse tiles intrinsically enter ~43% of all clusters --
secondary-bounce cost is tile-culling-bound by design, so perf work
should target the per-resort overheads (sort cadence, fused lax.sort)
and the per-entered-cluster triangle loop, not the key. Together with
scripts/sim_treelet.py (descent ceiling +0.84%), this closes the
round-4 "structural mesh experiment" with numbers on both named
candidates.

Models the cluster kernel's tile traversal in NumPy: rays are sorted by a
candidate key, grouped into TILE-sized tiles, and for each tile we count
superclusters entered, clusters entered, and triangles tested — including
the front-to-back best_t saturation effect (approximated per ray by its
true nearest hit distance).

Secondary-bounce rays are sampled as cosine-weighted directions from
points on the mesh surface (statistically like bounce-1 rays).
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
# secondary-ray sample: origins on triangle surface, cosine dirs about normal
ti = rng.integers(0, len(v0), N)
u = rng.random(N); v = rng.random(N)
fl = u + v > 1; u[fl] = 1 - u[fl]; v[fl] = 1 - v[fl]
orig = v0[ti] + u[:, None]*e1[ti] + v[:, None]*e2[ti]
n = np.cross(e1[ti], e2[ti]); n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
# random facing sign (paths arrive from either side)
n *= np.where(rng.random(N) < 0.5, 1.0, -1.0)[:, None]
r1, r2 = rng.random(N), rng.random(N)
st = np.sqrt(r1); ph = 2*np.pi*r2
t1 = np.cross(n, np.where(np.abs(n[:, :1]) < 0.9, [[1,0,0]], [[0,1,0]]))
t1 /= np.maximum(np.linalg.norm(t1, axis=1, keepdims=True), 1e-12)
t2 = np.cross(n, t1)
d = (t1*(st*np.cos(ph))[:, None] + t2*(st*np.sin(ph))[:, None]
     + n*np.sqrt(np.maximum(1-r1, 0))[:, None])
orig = orig + n*1e-3

# true nearest hit per ray (for best_t saturation), via batched MT over clusters
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

def key_current(o_, d_, bits_cells=(2,2,2), octant_major=False, dir_bits=0):
    oct_ = (d_[:,0] > 0).astype(np.int64) + 2*(d_[:,1] > 0) + 4*(d_[:,2] > 0)
    cells = []
    mult = 1
    cell_id = np.zeros(len(o_), np.int64)
    for a in range(3):
        nb = bits_cells[a]
        c = np.clip(((o_[:,a]-lo[a]) / ext[a] * (1 << nb)).astype(np.int64), 0, (1<<nb)-1)
        cell_id = cell_id + c * mult
        mult <<= nb
    sub = np.zeros(len(o_), np.int64)
    nsub = 1
    if dir_bits == 1:  # sub-octant direction quantization: dominant-axis id
        ax = np.argmax(np.abs(d_), axis=1)
        sub = ax  # 3 values ~ 2 bits
        nsub = 3
    elif dir_bits >= 2:  # b bits per |component| within the octant
        b = dir_bits
        ad = np.abs(d_)
        q = np.clip((ad * (1 << b)).astype(np.int64), 0, (1 << b) - 1)
        sub = (q[:, 0] << (2 * b)) | (q[:, 1] << b) | q[:, 2]
        nsub = 1 << (3 * b)
    if octant_major:
        key = (oct_ * mult + cell_id) * nsub + sub
    else:
        key = (cell_id * 8 + oct_) * nsub + sub
    return key

def simulate(key):
    order = np.argsort(key, kind="stable")
    o_, d_, bt_ = orig[order], d[order], bt[order]
    n_tiles = len(o_) // TILE
    sc_in = cl_in = tri = 0
    for t in range(n_tiles):
        sl = slice(t*TILE, (t+1)*TILE)
        to, td, tb = o_[sl], d_[sl], bt_[sl]
        mx = np.sum(np.where(td[:,0] > 0, 1, -1)); my = np.sum(np.where(td[:,1] > 0, 1, -1)); mz = np.sum(np.where(td[:,2] > 0, 1, -1))
        oc = int(mx > 0) + 2*int(my > 0) + 4*int(mz > 0)
        inv = 1.0 / np.where(td == 0, 1e-12, td)
        def slab(boxes):  # boxes [K, 8] vs tile rays -> per-box any-useful
            t0s = (boxes[None,:,0:3] - to[:,None,:]) * inv[:,None,:]
            t1s = (boxes[None,:,3:6] - to[:,None,:]) * inv[:,None,:]
            lo_ = np.minimum(t0s, t1s).max(axis=2)
            hi_ = np.maximum(t0s, t1s).min(axis=2)
            return ((hi_ >= np.maximum(lo_, 0)) & (lo_ < tb[:,None])).any(axis=0)
        scu = slab(sc_rows[oc])
        sc_in += int(scu.sum())
        for s in np.nonzero(scu)[0]:
            clu = slab(cl_rows[oc, s])
            cl_in += int(clu.sum())
            tri += int(clu.sum()) * mk.CLUSTER
    return sc_in/n_tiles, cl_in/n_tiles, tri/n_tiles

variants = {
    "current 4x4x4+oct": key_current(orig, d),
    "8x4x4 longest axis": key_current(orig, d, bits_cells=(3,2,2)),
    "8x8x8+oct (12bit)": key_current(orig, d, bits_cells=(3,3,3)),
    "octant-major 4x4x4": key_current(orig, d, octant_major=True),
    "16x16x16+oct": key_current(orig, d, bits_cells=(4,4,4)),
    # direction-resolution sweep (2026-08-20): every variant above varies
    # only the ORIGIN grid; these refine the direction key past the octant
    # — the bounce-1-specific reorder hypothesis (VERDICT r4 #5)
    "4x4x4+oct+domaxis": key_current(orig, d, dir_bits=1),
    "4x4x4+oct+dir2b": key_current(orig, d, dir_bits=2),
    "2x2x2+oct+dir2b": key_current(orig, d, bits_cells=(1,1,1), dir_bits=2),
    "2x2x2+oct+dir3b": key_current(orig, d, bits_cells=(1,1,1), dir_bits=3),
    "dir-major oct+dir2b": key_current(orig, d, octant_major=True, dir_bits=2),
}
for name, key in variants.items():
    t0 = time.time()
    sc, cl, tr = simulate(key)
    print(f"{name:22s} SC/tile {sc:6.1f}  clusters/tile {cl:7.1f}  tris/tile {tr:9.0f}  ({time.time()-t0:.0f}s)")
