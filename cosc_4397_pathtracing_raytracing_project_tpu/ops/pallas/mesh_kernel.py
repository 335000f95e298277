"""Cluster-culled triangle intersection kernel (Pallas TPU).

Per-lane BVH pointer chasing is hostile to a vector machine: an XLA
while-loop traversal runs until the *worst* of millions of lanes finishes,
with multi-megabyte gathers per step (it watchdog-killed the TPU worker on
the 38k-triangle benchmark scene). This kernel replaces lane-divergent
descent with *tile-level* culling, which is how divergence maps to a TPU:

- triangles are pre-sorted into BVH leaf order (spatially coherent) and
  packed into fixed clusters of CLUSTER tris with precomputed AABBs;
- the kernel grids over ray tiles; each tile sweeps the cluster list,
  performs a vectorized slab test of its rays against the cluster AABB, and
  skips the whole 128-triangle block with a single scalar branch
  (`pl.when(any(hit))`) when no ray in the tile can improve — divergence is
  amortized across a tile instead of per lane;
- within a visited cluster, triangles stream as dynamic (1, 12) VMEM row
  loads broadcast against all lanes (Möller–Trumbore, ~45 VPU ops/tri);
- `best_t` lives in VMEM scratch so later clusters are rejected against the
  current nearest hit (entry-distance cull).

Cost is bounded by (clusters visited per tile) × CLUSTER, independent of
per-lane divergence. Analytic primitives are handled by ops.fast / ops.bvh;
this kernel is triangles only.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLUSTER = 128  # triangles per cluster (one packed row block)
TILE_ROWS = 8  # ray tile = TILE_ROWS × 128 lanes
LANES = 128
TILE = TILE_ROWS * LANES

_MISS = 1e30
_BACKOFF = 1e-4


def pack_triangles(
    v0: np.ndarray, e1: np.ndarray, e2: np.ndarray, material_id=None
):
    """Pack (already BVH-leaf-ordered) triangles into cluster blocks.

    Returns (tri_rows [Tpad, 12] f32, aabbs [C, 8] f32, Tpad). Padding rows
    are degenerate (zero edges → det 0 → never hit). Column 9 carries the
    per-triangle material id (as f32); 10-11 are free payload."""
    t = v0.shape[0]
    c = (t + CLUSTER - 1) // CLUSTER
    tpad = c * CLUSTER
    rows = np.zeros((tpad, 12), np.float32)
    rows[:t, 0:3] = v0
    rows[:t, 3:6] = e1
    rows[:t, 6:9] = e2
    if material_id is not None:
        rows[:t, 9] = np.asarray(material_id, np.float32)
    aabbs = np.zeros((c, 8), np.float32)
    v1 = v0 + e1
    v2 = v0 + e2
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    for i in range(c):
        lo = i * CLUSTER
        hi = min(lo + CLUSTER, t)
        aabbs[i, 0:3] = tmin[lo:hi].min(axis=0) - 1e-5
        aabbs[i, 3:6] = tmax[lo:hi].max(axis=0) + 1e-5
    return rows, aabbs, tpad


def _make_kernel(num_clusters: int):
    def kernel(tri_ref, aabb_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
               dz_ref, act_ref, t_out, i_out, nx_out, ny_out, nz_out, m_out,
               best_t, best_i, bnx, bny, bnz, bmat):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        active = act_ref[:] > 0.5  # dead lanes never mark a cluster useful
        inv_dx = 1.0 / dx
        inv_dy = 1.0 / dy
        inv_dz = 1.0 / dz
        best_t[:] = jnp.full(ox.shape, _MISS, jnp.float32)
        best_i[:] = jnp.full(ox.shape, -1, jnp.int32)
        bnx[:] = jnp.zeros(ox.shape, jnp.float32)
        bny[:] = jnp.zeros(ox.shape, jnp.float32)
        bnz[:] = jnp.zeros(ox.shape, jnp.float32)
        bmat[:] = jnp.zeros(ox.shape, jnp.float32)

        def cluster_body(c, _):
            box = aabb_ref[pl.ds(c, 1), :]  # (1, 8)
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
            useful = (tmax >= tmin) & (tmin < best_t[:]) & active

            @pl.when(jnp.any(useful))
            def _():
                def tri_body(j, _):
                    row = tri_ref[pl.ds(c * CLUSTER + j, 1), :]  # (1, 12)
                    v0x, v0y, v0z = row[0, 0], row[0, 1], row[0, 2]
                    e1x, e1y, e1z = row[0, 3], row[0, 4], row[0, 5]
                    e2x, e2y, e2z = row[0, 6], row[0, 7], row[0, 8]
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
                        & (t < best_t[:])
                    )
                    # geometric normal, flipped to face the incoming ray
                    # (normalized once after the sweep)
                    fnx = e1y * e2z - e1z * e2y
                    fny = e1z * e2x - e1x * e2z
                    fnz = e1x * e2y - e1y * e2x
                    fsign = jnp.where(dx * fnx + dy * fny + dz * fnz < 0, 1.0, -1.0)
                    best_t[:] = jnp.where(ok, t, best_t[:])
                    best_i[:] = jnp.where(ok, c * CLUSTER + j, best_i[:])
                    bnx[:] = jnp.where(ok, fnx * fsign, bnx[:])
                    bny[:] = jnp.where(ok, fny * fsign, bny[:])
                    bnz[:] = jnp.where(ok, fnz * fsign, bnz[:])
                    bmat[:] = jnp.where(ok, row[0, 9], bmat[:])
                    return 0

                jax.lax.fori_loop(0, CLUSTER, tri_body, 0)

            return 0

        jax.lax.fori_loop(0, num_clusters, cluster_body, 0)
        t_out[:] = best_t[:]
        i_out[:] = best_i[:]
        rn = jax.lax.rsqrt(
            jnp.maximum(bnx[:] * bnx[:] + bny[:] * bny[:] + bnz[:] * bnz[:], 1e-30)
        )
        nx_out[:] = bnx[:] * rn
        ny_out[:] = bny[:] * rn
        nz_out[:] = bnz[:] * rn
        m_out[:] = bmat[:]

    return kernel


# rays per pallas dispatch — keeps each call's outputs small enough that XLA
# never tries to park them in VMEM (observed scoped-vmem OOM at 2M rays)
_CHUNK_ROWS = 1024  # 128k rays per call


@functools.partial(jax.jit, static_argnames=("num_clusters", "interpret"))
def _intersect(
    tri_rows: jnp.ndarray,
    aabbs: jnp.ndarray,
    ox, oy, oz, dx, dy, dz, active,
    num_clusters: int,
    interpret: bool = False,
):
    n = ox.shape[0]
    chunk = _CHUNK_ROWS * LANES
    n_pad = ((n + chunk - 1) // chunk) * chunk
    n_chunks = n_pad // chunk

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
    call = pl.pallas_call(
        _make_kernel(num_clusters),
        grid=(_CHUNK_ROWS // TILE_ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tri rows (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cluster aabbs (full)
            block, block, block, block, block, block, block,
        ],
        out_specs=(block,) * 6,
        out_shape=(
            f32,
            jax.ShapeDtypeStruct((_CHUNK_ROWS, LANES), jnp.int32),
            f32, f32, f32, f32,
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_ROWS, LANES), jnp.float32),
            pltpu.VMEM((TILE_ROWS, LANES), jnp.int32),
            pltpu.VMEM((TILE_ROWS, LANES), jnp.float32),
            pltpu.VMEM((TILE_ROWS, LANES), jnp.float32),
            pltpu.VMEM((TILE_ROWS, LANES), jnp.float32),
            pltpu.VMEM((TILE_ROWS, LANES), jnp.float32),
        ],
        interpret=interpret,
    )

    def one(chunk_args):
        cox, coy, coz, cdx, cdy, cdz, cact = chunk_args
        return call(tri_rows, aabbs, cox, coy, coz, cdx, cdy, cdz, cact)

    outs = jax.lax.map(one, args)
    return tuple(o.reshape(-1)[:n] for o in outs)


class ClusterMeshIntersector:
    """Triangle nearest-hit via the cluster-culled Pallas kernel.

    Construct from BVH-leaf-ordered triangle arrays. `__call__` returns
    (t, index) like ops.bvh's triangle traversal; `call_soa` additionally
    returns the ray-facing unit normal and the per-triangle material id,
    all computed in-kernel (no host-side winner gathers)."""

    def __init__(self, v0, e1, e2, material_id=None, interpret: bool = False):
        rows, aabbs, tpad = pack_triangles(
            np.asarray(v0, np.float32),
            np.asarray(e1, np.float32),
            np.asarray(e2, np.float32),
            material_id,
        )
        self.tri_rows = jnp.asarray(rows)
        self.aabbs = jnp.asarray(aabbs)
        self.num_clusters = aabbs.shape[0]
        self.interpret = interpret

    def call_soa(self, ox, oy, oz, dx, dy, dz, active=None):
        """(t, idx, nx, ny, nz, mat_f32) component arrays; idx = -1 on miss.
        `active` (optional [N] f32/bool) lets whole ray tiles skip cluster
        blocks once their lanes are dead."""
        if active is None:
            active = jnp.ones(ox.shape, jnp.float32)
        return _intersect(
            self.tri_rows,
            self.aabbs,
            ox, oy, oz, dx, dy, dz, active.astype(jnp.float32),
            num_clusters=self.num_clusters,
            interpret=self.interpret,
        )

    def __call__(self, origins, directions) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t, i, _, _, _, _ = self.call_soa(
            origins[:, 0], origins[:, 1], origins[:, 2],
            directions[:, 0], directions[:, 1], directions[:, 2],
        )
        return t, i
