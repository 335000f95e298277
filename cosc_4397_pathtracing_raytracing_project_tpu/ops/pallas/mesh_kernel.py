"""Cluster-culled triangle intersection kernel (Pallas TPU).

Per-lane BVH pointer chasing is hostile to a vector machine: an XLA
while-loop traversal runs until the *worst* of millions of lanes finishes,
with multi-megabyte gathers per step (it watchdog-killed the TPU worker on
the 38k-triangle benchmark scene). This kernel replaces lane-divergent
descent with *tile-level* culling, which is how divergence maps to a TPU:

- triangles are pre-sorted into BVH leaf order (spatially coherent) and
  packed into fixed clusters of ``cluster_size`` tris with precomputed
  AABBs; consecutive clusters are further grouped into **superclusters**
  of SUPER clusters each, a two-level hierarchy;
- the kernel grids over ray tiles; each tile walks the supercluster list,
  slab-tests its rays against the supercluster AABB, and only on a hit
  descends to the member clusters — a miss skips SUPER × cluster_size
  triangles with one vectorized test (`pl.when(any(hit))`); divergence is
  amortized across a tile instead of per lane;
- clusters and superclusters are visited in **front-to-back order for the
  tile's majority direction octant** (8 precomputed visit permutations) so
  `best_t` saturates after the first few hits and the entry-distance cull
  (`tmin < best_t`) rejects everything behind it;
- a tile whose lanes are all dead (wavefront sorting pushes dead lanes to
  the tail) skips the entire sweep with one scalar branch;
- within a visited cluster, triangles stream as dynamic (1, ROWF) VMEM row
  loads broadcast against all lanes (Möller–Trumbore in scalar-triple-product
  form against precomputed per-triangle constants — no per-pair crosses);
- `best_t` lives in VMEM scratch so later clusters are rejected against the
  current nearest hit.

The result is order-independent (each triangle test keeps the strict
nearest `t < best_t`), so the per-octant visit permutations affect only
speed, never the image. Cost is bounded by (clusters actually entered per
tile) × cluster_size, independent of per-lane divergence. Analytic
primitives are handled by ops.fast / ops.bvh; this kernel is triangles only.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLUSTER = 64   # default triangles per cluster (one packed row block)
# Clusters per supercluster. 1080p/38.5k-tri fresh-process TPU sweep
# (2026-08-18, fused sort, cells=2): 8 → 4.90, 16 → 4.97, 32 → 4.965,
# 64 → 4.91 M rays/s — a flat plateau at 16-32, so 16 stays. With
# CLUSTER {32: 4.82, 64: 4.90, 128: 4.78} and TILE_ROWS {16: 4.90,
# 32: 2.91} this closes the kernel-shape tuning space; further mesh
# wins need a structural change (see docs/ROADMAP.md).
SUPER = 16
# Boxes slab-tested per scalar branch (see kernel notes). Fresh-process
# TPU sweep (2026-08-18, same config as the SUPER sweep): 4 → 4.958,
# 8 → 4.97, 16 → 4.879 M rays/s — 8 stays (16 halves the scalar
# branches but wastes too much vector work past a hit).
BATCH = 8
# Ray tile = TILE_ROWS × 128 lanes. 1080p sweep (38.5k tris, depth 8):
# 8 → 936, 16 → 831 ms/sample — wider tiles amortize the per-box scalar
# branches faster than they lose tile-frustum coherence.
#
# Sub-tile granularity for the cluster-ENTER predicate was built and
# measured DEAD (2026-08-18, fresh-process TPU A/B): gating the
# 64-triangle loop per (8,128) half-tile scored 4.18 vs 4.90 M rays/s
# (−15%), with the offline predictor (scripts/sim_halftile.py) capping
# the theoretical win at 5.5% (half-tiles enter 1.54/2 of parent-entered
# clusters; quarter-tiles 2.46/4 are worse still). Lesson: roughly half
# the per-triangle ops (the row load + 14 element broadcasts) don't
# shrink with lane-width, so halving the width saves ~25% per instance
# while +54% instances add full cost. See the ABLATION note below for
# the follow-up that settled the loop's exact cost composition.
TILE_ROWS = 16
LANES = 128
TILE = TILE_ROWS * LANES

_MISS = 1e30
_BACKOFF = 1e-4

# Timing-probe knob (fresh process only, images are WRONG under it):
#   ''        normal kernel
#   'notri'   keep the per-triangle row loads + element extracts, replace
#             the Möller–Trumbore vector math with a trivial combine —
#             isolates the scalar/extract stream's share of the loop
#   'noload'  keep the full MT math, but reuse the cluster's FIRST row for
#             every iteration (one load hoisted out of the loop) —
#             isolates the vector math's share
# Driven by scripts/bench_mesh.py --ablation; see the TILE_ROWS comment
# for why this composition question decides the structural direction.
ABLATION = ""
# Cost composition, settled by the ablation probes + a software-pipelining
# A/B (fresh-process TPU, 2026-08-18): ctrl 427, notri (loads/extracts
# only) 202, noload (MT math only) 198 ms/sample — the halves sum to the
# whole, and an explicit prefetch-row-j+1 restructure measured EXACTLY
# neutral (427.5 vs 427.5; 424.7 vs 425.8). Conclusion: the element
# broadcasts are themselves VPU ops, so the triangle loop is purely
# vector-op-count bound (~66 ops/triangle: 14 broadcasts + ~40 MT +
# selects) with nothing left to overlap. Per-test cost is at the
# algorithm's speed of light; the only remaining lever is testing fewer
# triangles per tile, and the culling/tuning space above is exhausted.

# XLA compile options for any jit that wraps the mesh pipeline. Small
# frames (≤ 2 chunks) tempt XLA to park the chunk loop's carried pallas
# operands/results in scoped VMEM; the co-live set peaks at ~32.06M
# against a 16M default limit (hard compile error). v5e VMEM is 128M, so
# a 48M scoped budget is safe — and parking operands in VMEM is a win
# when it fits. Applied by engine.make_mesh_step, the sharded mesh step,
# and scripts/bench_mesh.py.
JIT_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": 49152}

# the 8 octant diagonal directions, index = (dx>0) + 2(dy>0) + 4(dz>0)
_OCTANT_SIGNS = np.array(
    [[1 if o & (1 << a) else -1 for a in range(3)] for o in range(8)],
    np.float32,
)


def treelet_cut(bvh, cluster_size: int):
    """Cut a preorder FlatBVH (ops.bvh) into a two-level treelet partition.

    Returns (clusters, membership): ``clusters`` is a list of (start, count)
    primitive ranges — the deepest subtrees with ≤ cluster_size primitives —
    and ``membership[s]`` lists the cluster ids of supercluster s (the
    deepest subtrees containing ≤ SUPER clusters). Subtree AABBs are far
    tighter than fixed runs of leaf order, so tiles enter fewer triangle
    blocks. Preorder + contiguous leaf emission ⇒ every subtree is a
    contiguous primitive range, so clusters stay contiguous in the packed
    row array."""
    k = bvh.bounds_min.shape[0]
    leaf = bvh.leaf_start >= 0
    prim_count = np.zeros(k, np.int64)
    prim_start = np.zeros(k, np.int64)
    for n in range(k - 1, -1, -1):
        if leaf[n]:
            prim_start[n] = bvh.leaf_start[n]
            prim_count[n] = bvh.leaf_count[n]
        else:
            left = n + 1
            right = int(bvh.miss_link[left])
            prim_start[n] = prim_start[left]
            prim_count[n] = prim_count[left] + prim_count[right]

    def cut(pred):
        out = []
        stack = [0]
        while stack:
            n = stack.pop()
            if pred(n) or leaf[n]:
                out.append(n)
            else:
                left = n + 1
                stack.append(int(bvh.miss_link[left]))  # right
                stack.append(left)  # popped first → preorder
        return out

    cl_nodes = cut(lambda n: prim_count[n] <= cluster_size)
    clusters = []
    for n in cl_nodes:
        s, c = int(prim_start[n]), int(prim_count[n])
        # an oversized leaf (leaf_size > cluster_size) splits into runs
        for lo in range(s, s + c, cluster_size):
            clusters.append((lo, min(cluster_size, s + c - lo)))
    starts = np.asarray([c[0] for c in clusters], np.int64)

    def c_range(n):
        lo = int(np.searchsorted(starts, prim_start[n]))
        hi = int(np.searchsorted(starts, prim_start[n] + prim_count[n]))
        return lo, hi

    sc_nodes = cut(lambda n: (lambda r: r[1] - r[0] <= SUPER)(c_range(n)))
    membership = []
    for n in sc_nodes:
        lo, hi = c_range(n)
        # an SC node can still exceed SUPER clusters (oversized-leaf splits):
        # emit multiple superclusters over the run
        for mlo in range(lo, hi, SUPER):
            membership.append(list(range(mlo, min(mlo + SUPER, hi))))
    return clusters, membership


ROWF = 14  # floats per packed triangle row


def pack_clusters(
    v0: np.ndarray,
    e1: np.ndarray,
    e2: np.ndarray,
    material_id,
    clusters,
    cluster_size: int,
):
    """Pack triangle clusters into fixed-size row blocks.

    Returns (tri_rows [(C·cluster_size), ROWF] f32, aabbs [C, 8] f32).
    Rows carry classic Möller–Trumbore operands (the cross-product form has
    the best ILP on the VPU — a fully dot-product "scalar triple product"
    rewrite measured 22% *slower* from its longer dependency chains) plus
    the precomputed geometric normal n = e1×e2, which replaces a per-(ray,
    triangle) cross and facing dot: d·n = −det, so the facing sign is just
    sign(det).

    Row layout: v0(0:3) e1(3:6) e2(6:9) n(9:12), col 12 = material id,
    col 13 = the triangle's index in the caller's arrays (returned as the
    hit id). Padding rows are all-zero (zero edges → det 0 → never hit).
    AABB rows: min(3) max(3), col 6 = base row of the cluster's block,
    col 7 free."""
    if len(v0) >= (1 << 24):
        # cols 12-13 round-trip ids through f32 (exact only below 2^24);
        # mirrors the pixel-id guard in fast.trace_sample_mesh
        raise ValueError(
            f"mesh has {len(v0)} triangles; the cluster kernel's f32 id "
            "columns are exact only below 2^24"
        )
    c = len(clusters)
    rows = np.zeros((c * cluster_size, ROWF), np.float32)
    aabbs = np.zeros((c, 8), np.float32)
    v1 = v0 + e1
    v2 = v0 + e2
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    n = np.cross(e1, e2)
    for i, (lo, cnt) in enumerate(clusters):
        base = i * cluster_size
        rows[base : base + cnt, 0:3] = v0[lo : lo + cnt]
        rows[base : base + cnt, 3:6] = e1[lo : lo + cnt]
        rows[base : base + cnt, 6:9] = e2[lo : lo + cnt]
        rows[base : base + cnt, 9:12] = n[lo : lo + cnt]
        if material_id is not None:
            rows[base : base + cnt, 12] = material_id[lo : lo + cnt]
        rows[base : base + cnt, 13] = np.arange(lo, lo + cnt, dtype=np.float32)
        aabbs[i, 0:3] = tmin[lo : lo + cnt].min(axis=0) - 1e-5
        aabbs[i, 3:6] = tmax[lo : lo + cnt].max(axis=0) + 1e-5
        aabbs[i, 6] = base
    return rows, aabbs


def build_visit_tables(aabbs: np.ndarray, membership):
    """Two-level, per-octant visit tables for the kernel.

    `aabbs` [C, 8] are cluster AABB rows (col 6 = triangle-block base);
    `membership[s]` lists the cluster ids of supercluster s (≤ SUPER each).
    Returns (sc_rows [(8·S), 8], cl_rows [(8·S·SUPER), 8], S):

    - ``sc_rows[o·S + s]``: AABB of the s-th supercluster in octant o's
      front-to-back order (payload unused);
    - ``cl_rows[o·S·SUPER + s·SUPER + k]``: AABB row of the k-th member
      cluster (front-to-back within its supercluster).

    Padding slots are degenerate point boxes at (+FAR,+FAR,+FAR): the slab
    entry distance is astronomically beyond any live `best_t` (≤ _MISS), so
    `tmin < best_t` rejects them; supercluster AABBs span only their real
    members so padding never inflates a parent box."""
    # supercluster count padded to a BATCH multiple (the kernel sweeps
    # BATCH boxes per scalar branch); pad entries are far boxes
    s_count = ((len(membership) + BATCH - 1) // BATCH) * BATCH
    far = np.float32(3e30)

    sc = np.zeros((s_count, 8), np.float32)
    sc[:, 0:6] = far
    grp = np.zeros((s_count, SUPER, 8), np.float32)
    grp[:, :, 0:6] = far  # pad slots: point at (FAR,FAR,FAR), always rejected
    for s, members in enumerate(membership):
        m = aabbs[members]
        grp[s, : len(members)] = m
        sc[s, 0:3] = m[:, 0:3].min(axis=0)
        sc[s, 3:6] = m[:, 3:6].max(axis=0)
    sc_centers = 0.5 * (sc[:, 0:3] + sc[:, 3:6])

    sc_rows = np.zeros((8, s_count, 8), np.float32)
    cl_rows = np.zeros((8, s_count, SUPER, 8), np.float32)
    for o in range(8):
        d = _OCTANT_SIGNS[o]
        sc_key = sc_centers @ d
        sc_key = np.where(sc[:, 0] >= far, np.inf, sc_key)  # pads last
        sc_ord = np.argsort(sc_key, kind="stable")
        sc_rows[o] = sc[sc_ord]
        for si, s in enumerate(sc_ord):
            members = grp[s]
            key = 0.5 * (members[:, 0:3] + members[:, 3:6]) @ d
            key = np.where(members[:, 0] >= far, np.inf, key)  # pads last
            cl_rows[o, si] = members[np.argsort(key, kind="stable")]
    return (
        sc_rows.reshape(8 * s_count, 8),
        cl_rows.reshape(8 * s_count * SUPER, 8),
        s_count,
    )


def _slab(box, ox, oy, oz, inv_dx, inv_dy, inv_dz, best_t, active):
    t0x = (box[0, 0] - ox) * inv_dx
    t1x = (box[0, 3] - ox) * inv_dx
    t0y = (box[0, 1] - oy) * inv_dy
    t1y = (box[0, 4] - oy) * inv_dy
    t0z = (box[0, 2] - oz) * inv_dz
    t1z = (box[0, 5] - oz) * inv_dz
    lox = jnp.minimum(t0x, t1x)
    hix = jnp.maximum(t0x, t1x)
    loy = jnp.minimum(t0y, t1y)
    hiy = jnp.maximum(t0y, t1y)
    loz = jnp.minimum(t0z, t1z)
    hiz = jnp.maximum(t0z, t1z)
    tmin = jnp.maximum(jnp.maximum(lox, loy), jnp.maximum(loz, 0.0))
    tmax = jnp.minimum(jnp.minimum(hix, hiy), hiz)
    return (tmax >= tmin) & (tmin < best_t) & active


def _make_kernel(num_super: int, cluster_size: int, ablation: str = "",
                 mode: str = "full"):
    # mode='full': nearest hit with winner normal/material/index (6 outputs).
    # mode='tmin': nearest DISTANCE only (1 output, 1 scratch) — the shadow-
    # ray variant: drops the 5 winner-payload broadcasts + selects from the
    # triangle loop and keeps the pallas call's VMEM footprint minimal (the
    # full kernel's 6 (1024,128) outputs next to the main intersect's own
    # were observed to blow the 16M scoped-vmem limit when XLA parked both
    # calls' outputs in VMEM).
    full = mode == "full"
    assert full or not ablation, "ablation probes only exist in full mode"

    def kernel(tri_ref, sc_ref, cl_ref, ox_ref, oy_ref, oz_ref, dx_ref,
               dy_ref, dz_ref, act_ref, *rest):
        if full:
            (t_out, i_out, nx_out, ny_out, nz_out, m_out,
             best_t, best_i, bnx, bny, bnz, bmat) = rest
        else:
            t_out, best_t = rest
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        active = act_ref[:] > 0.5  # dead lanes never mark a cluster useful
        inv_dx = 1.0 / dx
        inv_dy = 1.0 / dy
        inv_dz = 1.0 / dz
        best_t[:] = jnp.full(ox.shape, _MISS, jnp.float32)
        if full:
            best_i[:] = jnp.full(ox.shape, -1, jnp.int32)
            bnx[:] = jnp.zeros(ox.shape, jnp.float32)
            bny[:] = jnp.zeros(ox.shape, jnp.float32)
            bnz[:] = jnp.zeros(ox.shape, jnp.float32)
            bmat[:] = jnp.zeros(ox.shape, jnp.float32)

        # majority direction octant of the tile's (live) rays — the
        # wavefront sort makes tiles octant-coherent, so a per-axis
        # majority vote recovers the bucket's octant; the result only
        # selects a visit order, never the hit set
        live = jnp.where(active, 1.0, 0.0)
        mx = jnp.sum(jnp.where(dx > 0, live, -live))
        my = jnp.sum(jnp.where(dy > 0, live, -live))
        mz = jnp.sum(jnp.where(dz > 0, live, -live))
        octant = (
            (mx > 0).astype(jnp.int32)
            + 2 * (my > 0).astype(jnp.int32)
            + 4 * (mz > 0).astype(jnp.int32)
        )
        sc_base = octant * num_super
        cl_base = octant * (num_super * SUPER)

        def make_tri_body(base):
            def tri_body(j, carry):
                # winner state rides the loop carry (vector registers):
                # per-triangle scratch-ref read/writes would round-trip VMEM
                # 12× per triangle
                if full:
                    bt, bi, cnx, cny, cnz, cbm = carry
                else:
                    (bt,) = carry
                if ablation == "noload":
                    # timing probe: full MT math on per-iteration immediates
                    # (no VMEM row load, no element extracts). Values vary by
                    # j so the unrolled iterations can't CSE-collapse.
                    f = lambda k: jnp.float32(0.11 * ((j * 14 + k) % 97) - 4.0)
                    v0x, v0y, v0z = f(0), f(1), f(2)
                    e1x, e1y, e1z = f(3), f(4), f(5)
                    e2x, e2y, e2z = f(6), f(7), f(8)
                    row = None
                else:
                    row = tri_ref[pl.ds(base + j, 1), :]  # (1, ROWF)
                    v0x, v0y, v0z = row[0, 0], row[0, 1], row[0, 2]
                    e1x, e1y, e1z = row[0, 3], row[0, 4], row[0, 5]
                    e2x, e2y, e2z = row[0, 6], row[0, 7], row[0, 8]
                if ablation == "notri":
                    # timing probe: consume all 14 loaded elements in one
                    # chain, skip the MT math entirely
                    s14 = (v0x + v0y + v0z + e1x + e1y + e1z
                           + e2x + e2y + e2z + row[0, 9] + row[0, 10]
                           + row[0, 11] + row[0, 12] + row[0, 13])
                    dead = (ox + s14) < jnp.float32(-3e30)  # always False
                    return (jnp.where(dead, bt - 1.0, bt), bi,
                            cnx, cny, cnz, cbm)
                # Möller–Trumbore, all lanes vs one triangle
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = (
                    (jnp.abs(det) > 1e-9)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > _BACKOFF)
                    & (t < bt)
                )
                # geometric normal = stored n = e1×e2, flipped to face the
                # incoming ray: d·n = −det, so the facing sign is just
                # sign(det) (normalized once after the sweep)
                if not full:
                    return (jnp.where(ok, t, bt),)
                fsign = jnp.where(det > 0, 1.0, -1.0)
                if ablation == "noload":
                    n9, n10, n11, n12 = f(9), f(10), f(11), f(12)
                    i13 = jnp.int32(j)
                else:
                    n9, n10, n11 = row[0, 9], row[0, 10], row[0, 11]
                    n12 = row[0, 12]
                    i13 = row[0, 13].astype(jnp.int32)
                return (
                    jnp.where(ok, t, bt),
                    jnp.where(ok, i13, bi),
                    jnp.where(ok, n9 * fsign, cnx),
                    jnp.where(ok, n10 * fsign, cny),
                    jnp.where(ok, n11 * fsign, cnz),
                    jnp.where(ok, n12, cbm),
                )

            return tri_body

        # Every `jnp.any` + `pl.when` costs a vector→scalar pipeline drain
        # (~450 cycles measured — dwarfing the ~35-op slab test itself), so
        # boxes are tested in BATCHes: one vector OR over BATCH slab tests,
        # ONE scalar branch; only batches with a hit pay per-box branches.
        # Misses dominate a front-to-back sweep, so the drain count drops
        # ~BATCH× on the skip path.
        def cluster_body(cc, s):
            box = cl_ref[pl.ds(cl_base + s * SUPER + cc, 1), :]  # (1, 8)
            useful = _slab(box, ox, oy, oz, inv_dx, inv_dy, inv_dz,
                           best_t[:], active)

            @pl.when(jnp.any(useful))
            def _():
                base = box[0, 6].astype(jnp.int32)
                init = (
                    (best_t[:], best_i[:], bnx[:], bny[:], bnz[:], bmat[:])
                    if full
                    else (best_t[:],)
                )
                out = jax.lax.fori_loop(
                    0, cluster_size, make_tri_body(base), init, unroll=True
                )
                if full:
                    (best_t[:], best_i[:], bnx[:], bny[:], bnz[:],
                     bmat[:]) = out
                else:
                    best_t[:] = out[0]

            return s

        def cluster_batch_body(cb, s):
            bt = best_t[:]
            m = None
            for j in range(BATCH):  # static: BATCH fused tests, no sync
                box = cl_ref[pl.ds(cl_base + s * SUPER + cb * BATCH + j, 1), :]
                u = _slab(box, ox, oy, oz, inv_dx, inv_dy, inv_dz, bt, active)
                m = u if m is None else (m | u)

            @pl.when(jnp.any(m))
            def _():
                jax.lax.fori_loop(
                    cb * BATCH, (cb + 1) * BATCH, cluster_body, s
                )

            return s

        def super_batch_body(b, _):
            bt = best_t[:]
            m = None
            for j in range(BATCH):
                scbox = sc_ref[pl.ds(sc_base + b * BATCH + j, 1), :]
                u = _slab(scbox, ox, oy, oz, inv_dx, inv_dy, inv_dz, bt, active)
                m = u if m is None else (m | u)

            @pl.when(jnp.any(m))
            def _():
                def super_body(s, _):
                    scbox = sc_ref[pl.ds(sc_base + s, 1), :]
                    useful = _slab(scbox, ox, oy, oz, inv_dx, inv_dy,
                                   inv_dz, best_t[:], active)

                    @pl.when(jnp.any(useful))
                    def _():
                        jax.lax.fori_loop(
                            0, SUPER // BATCH, cluster_batch_body, s
                        )

                    return 0

                jax.lax.fori_loop(b * BATCH, (b + 1) * BATCH, super_body, 0)

            return 0

        @pl.when(jnp.any(active))
        def _():
            jax.lax.fori_loop(0, num_super // BATCH, super_batch_body, 0)

        t_out[:] = best_t[:]
        if full:
            i_out[:] = best_i[:]
            rn = jax.lax.rsqrt(
                jnp.maximum(
                    bnx[:] * bnx[:] + bny[:] * bny[:] + bnz[:] * bnz[:],
                    1e-30,
                )
            )
            nx_out[:] = bnx[:] * rn
            ny_out[:] = bny[:] * rn
            nz_out[:] = bnz[:] * rn
            m_out[:] = bmat[:]

    return kernel


# rays per pallas dispatch — keeps each call's outputs small enough that XLA
# never tries to park them in VMEM (observed scoped-vmem OOM at 2M rays)
_CHUNK_ROWS = 1024  # 128k rays per call


@functools.partial(
    jax.jit,
    static_argnames=("num_super", "cluster_size", "interpret",
                     "ablation", "mode"),
)
def _intersect(
    tri_rows: jnp.ndarray,
    sc_rows: jnp.ndarray,
    cl_rows: jnp.ndarray,
    ox, oy, oz, dx, dy, dz, active,
    num_super: int,
    cluster_size: int,
    interpret: bool = False,
    ablation: str = "",
    mode: str = "full",
):
    n = ox.shape[0]
    chunk = _CHUNK_ROWS * LANES
    n_pad = ((n + chunk - 1) // chunk) * chunk
    n_chunks = n_pad // chunk
    if n_chunks == 1 and not interpret:
        # A single-iteration lax.map unrolls to straight-line code, where
        # XLA parks the pallas calls' operands/results in scoped VMEM —
        # with NEE's two intersect calls per bounce that overflows the
        # 16M scoped-vmem limit (observed at 480×270: 32.05M > 16M).
        # A real ≥2-iteration loop keeps the buffers in HBM; the extra
        # all-dead pad chunk costs one scalar branch per tile.
        n_chunks, n_pad = 2, 2 * chunk

    def pad3(x, fill):
        if n_pad != n:
            x = jnp.concatenate([x, jnp.full((n_pad - n,), fill, x.dtype)])
        return x.reshape(n_chunks, _CHUNK_ROWS, LANES)

    # padding rays point along +x from far away, marked inactive
    args = (pad3(ox, 1e8), pad3(oy, 1e8), pad3(oz, 1e8),
            pad3(dx, 1.0), pad3(dy, 0.0), pad3(dz, 0.0),
            pad3(active, 0.0))

    block = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((_CHUNK_ROWS, LANES), jnp.float32)
    full = mode == "full"
    if full:
        out_specs = (block,) * 6
        out_shape = (
            f32,
            jax.ShapeDtypeStruct((_CHUNK_ROWS, LANES), jnp.int32),
            f32, f32, f32, f32,
        )
        scratch = [
            pltpu.VMEM((TILE_ROWS, LANES), jnp.float32),
            pltpu.VMEM((TILE_ROWS, LANES), jnp.int32),
            pltpu.VMEM((TILE_ROWS, LANES), jnp.float32),
            pltpu.VMEM((TILE_ROWS, LANES), jnp.float32),
            pltpu.VMEM((TILE_ROWS, LANES), jnp.float32),
            pltpu.VMEM((TILE_ROWS, LANES), jnp.float32),
        ]
    else:  # 'tmin': one output, one scratch — the shadow-ray variant
        out_specs = (block,)
        out_shape = (f32,)
        scratch = [pltpu.VMEM((TILE_ROWS, LANES), jnp.float32)]
    call = pl.pallas_call(
        _make_kernel(num_super, cluster_size, ablation, mode),
        grid=(_CHUNK_ROWS // TILE_ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tri rows (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # supercluster visit rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cluster visit rows
            block, block, block, block, block, block, block,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )

    def one(chunk_args):
        cox, coy, coz, cdx, cdy, cdz, cact = chunk_args
        return call(tri_rows, sc_rows, cl_rows, cox, coy, coz, cdx, cdy,
                    cdz, cact)

    outs = jax.lax.map(one, args)
    if not full:
        outs = (outs,) if not isinstance(outs, tuple) else outs
    return tuple(o.reshape(-1)[:n] for o in outs)


class ClusterMeshIntersector:
    """Triangle nearest-hit via the cluster-culled Pallas kernel.

    Construct from BVH-leaf-ordered triangle arrays. `__call__` returns
    (t, index) like ops.bvh's triangle traversal; `call_soa` additionally
    returns the ray-facing unit normal and the per-triangle material id,
    all computed in-kernel (no host-side winner gathers)."""

    def __init__(self, v0, e1, e2, material_id=None, interpret: bool = False,
                 cluster_size: int = CLUSTER, bvh=None):
        v0 = np.asarray(v0, np.float32)
        e1 = np.asarray(e1, np.float32)
        e2 = np.asarray(e2, np.float32)
        mat = (
            np.asarray(material_id, np.float32)
            if material_id is not None
            else None
        )
        t = v0.shape[0]
        if bvh is not None:
            # treelet partition: tight subtree AABBs at both levels. The
            # caller passes arrays already permuted into bvh.order space.
            clusters, membership = treelet_cut(bvh, cluster_size)
        else:
            # fixed consecutive runs (callers without a BVH; correct for any
            # input order, fastest when the input is spatially sorted)
            c = (t + cluster_size - 1) // cluster_size
            clusters = [
                (i * cluster_size, min(cluster_size, t - i * cluster_size))
                for i in range(c)
            ]
            membership = [
                list(range(i, min(i + SUPER, c))) for i in range(0, c, SUPER)
            ]
        rows, aabbs = pack_clusters(v0, e1, e2, mat, clusters, cluster_size)
        sc_rows, cl_rows, num_super = build_visit_tables(aabbs, membership)
        self.tri_rows = jnp.asarray(rows)
        self.sc_rows = jnp.asarray(sc_rows)
        self.cl_rows = jnp.asarray(cl_rows)
        self.num_super = num_super
        self.num_clusters = aabbs.shape[0]
        self.cluster_size = cluster_size
        self.interpret = interpret

    def call_soa(self, ox, oy, oz, dx, dy, dz, active=None):
        """(t, idx, nx, ny, nz, mat_f32) component arrays; idx = -1 on miss.
        `active` (optional [N] f32/bool) lets whole ray tiles skip cluster
        blocks once their lanes are dead."""
        if active is None:
            active = jnp.ones(ox.shape, jnp.float32)
        return _intersect(
            self.tri_rows,
            self.sc_rows,
            self.cl_rows,
            ox, oy, oz, dx, dy, dz, active.astype(jnp.float32),
            num_super=self.num_super,
            cluster_size=self.cluster_size,
            interpret=self.interpret,
            ablation=ABLATION,
        )

    def call_t(self, ox, oy, oz, dx, dy, dz, active=None) -> jnp.ndarray:
        """Nearest-hit DISTANCE only (_MISS when nothing hit) — the
        shadow-ray variant: 1 kernel output instead of 6 and no winner
        payload work in the triangle loop."""
        if active is None:
            active = jnp.ones(ox.shape, jnp.float32)
        (t,) = _intersect(
            self.tri_rows,
            self.sc_rows,
            self.cl_rows,
            ox, oy, oz, dx, dy, dz, active.astype(jnp.float32),
            num_super=self.num_super,
            cluster_size=self.cluster_size,
            interpret=self.interpret,
            mode="tmin",
        )
        return t

    def __call__(self, origins, directions) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t, i, _, _, _, _ = self.call_soa(
            origins[:, 0], origins[:, 1], origins[:, 2],
            directions[:, 0], directions[:, 1], directions[:, 2],
        )
        return t, i
