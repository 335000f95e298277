"""Counter-based RNG for replayable, order-independent sampling.

The reference seeds a per-thread `thrust::default_random_engine` with an
avalanche hash of ``(iter, pixel, depth)`` (`src/pathtrace.cu:203-207`,
`src/intersections.h:12-20`). The TPU-native equivalent is JAX's counter-based
threefry: one base key per render, folded with the (iteration, depth)
coordinates, drawing a ``[N, lanes]`` block of uniforms per bounce. Every
kernel invocation is replayable from ``(seed, iter, depth)`` alone — same
property as the reference, without per-lane hash state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Uniform lanes drawn per path per bounce, by role. The reference draws up to
# five u01 samples per thread per bounce (`pathtrace.cu:368-436`): Russian
# roulette, branch selection, and 2-3 direction samples.
U_RR = 0  # Russian roulette keep/kill
U_BRANCH = 1  # specular-vs-diffuse branch
U_A = 2  # direction sample 1
U_B = 3  # direction sample 2
U_C = 4  # direction sample 3 (cone-perturb azimuth)
NUM_LANES = 5


def render_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def bounce_key(base_key: jax.Array, iteration: jax.Array, depth) -> jax.Array:
    """Key for one (sample iteration, bounce depth) pair."""
    return jax.random.fold_in(jax.random.fold_in(base_key, iteration), depth)


def bounce_uniforms(base_key: jax.Array, iteration, depth, n: int) -> jax.Array:
    """``[n, NUM_LANES]`` float32 uniforms in [0, 1) for one bounce."""
    return jax.random.uniform(
        bounce_key(base_key, iteration, depth), (n, NUM_LANES), jnp.float32
    )


def hash_bounce_uniforms(
    base_key: jax.Array, iteration, depth, pixel_ids: jax.Array
) -> jax.Array:
    """``[NUM_LANES, n]`` uniforms from a counter-hash keyed by PIXEL id.

    Drop-in replacement for ``bounce_uniforms`` on reordered wavefronts:
    u[l, i] is a pure function of (key, iteration, depth, pixel_ids[i], l),
    so a sorted wavefront draws exactly the pixel-keyed streams with **no
    gather** — threefry generation plus a [lanes, n] gather costs ~70 ms per
    bounce at 2M rays, the hash ~5 ms. The hash is the murmur3-style
    avalanche used by the Pallas megakernel's interpret-mode PRNG
    (ops.pallas.megakernel._HashPrng); the reference's analog is its
    utilhash-seeded thrust engine (`src/pathtrace.cu:203-207`)."""
    kd = jax.random.key_data(base_key).reshape(-1)[-1].astype(jnp.uint32)
    # Injective (iteration, depth) -> counter for depth < 32, iteration < 2^27
    # (a 5000-spp render uses < 2^13 iterations), pushed through the full
    # murmur3 fmix32 finalizer (a bijection): no two (iteration, depth) pairs
    # can share a seed, so the frame-wide duplicated-uniform-block collisions
    # of the old single multiply-xor round cannot occur at all.
    ctr = (jnp.asarray(iteration).astype(jnp.uint32) << jnp.uint32(5)) | (
        jnp.asarray(depth).astype(jnp.uint32) & jnp.uint32(31)
    )
    x = ctr ^ (kd * jnp.uint32(0x9E3779B9))
    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> jnp.uint32(13))) * jnp.uint32(0xC2B2AE35)
    seed = x ^ (x >> jnp.uint32(16))
    p = pixel_ids.astype(jnp.uint32)
    us = []
    for lane in range(NUM_LANES):
        x = p ^ (seed + jnp.uint32(lane) * jnp.uint32(0x9E3779B9))
        x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
        x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
        x = x ^ (x >> jnp.uint32(16))
        us.append((x >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2.0**-24))
    return jnp.stack(us)


def hash_nee_uniforms(
    base_key: jax.Array, iteration, depth, pixel_ids: jax.Array
) -> jax.Array:
    """``[n, 3]`` NEE uniforms from the counter-hash, keyed by PIXEL id —
    the reordered-wavefront twin of :func:`nee_uniforms` (the mesh pipeline
    resorts rays per bounce, so lane-indexed draws would violate the
    pixel-keyed-RNG invariant that makes sorting image-invariant). Uses
    hash lanes NUM_LANES..NUM_LANES+2, disjoint from the bounce draws."""
    kd = jax.random.key_data(base_key).reshape(-1)[-1].astype(jnp.uint32)
    ctr = (jnp.asarray(iteration).astype(jnp.uint32) << jnp.uint32(5)) | (
        jnp.asarray(depth).astype(jnp.uint32) & jnp.uint32(31)
    )
    x = ctr ^ (kd * jnp.uint32(0x9E3779B9))
    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> jnp.uint32(13))) * jnp.uint32(0xC2B2AE35)
    seed = x ^ (x >> jnp.uint32(16))
    p = pixel_ids.astype(jnp.uint32)
    us = []
    for lane in range(NUM_LANES, NUM_LANES + 3):
        x = p ^ (seed + jnp.uint32(lane) * jnp.uint32(0x9E3779B9))
        x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
        x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
        x = x ^ (x >> jnp.uint32(16))
        us.append(
            (x >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2.0**-24)
        )
    return jnp.stack(us, axis=-1)


def nee_uniforms(base_key: jax.Array, iteration, depth, n: int) -> jax.Array:
    """``[n, 3]`` uniforms for direct light sampling (light pick + 2 surface
    coordinates; ops/lights.py). A separate fold tag keeps the existing
    bounce streams bit-identical whether or not NEE is enabled."""
    key = jax.random.fold_in(bounce_key(base_key, iteration, depth), 0x11EE)
    return jax.random.uniform(key, (n, 3), jnp.float32)


def pixel_jitter(base_key: jax.Array, iteration, n: int) -> jax.Array:
    """``[n, 2]`` sub-pixel jitter for antialiasing (extension: the reference
    generates rays through pixel corners with no jitter, `pathtrace.cu:278-282`)."""
    key = jax.random.fold_in(jax.random.fold_in(base_key, iteration), 0x7EA)
    return jax.random.uniform(key, (n, 2), jnp.float32)


def lens_uniforms(base_key: jax.Array, iteration, n: int) -> jax.Array:
    """``[n, 2]`` lens-disk uniforms for thin-lens depth of field (extension:
    the reference camera is strictly pinhole). Keyed like ``pixel_jitter``
    but on its own fold constant, so enabling DOF never perturbs the
    antialias or bounce streams."""
    key = jax.random.fold_in(jax.random.fold_in(base_key, iteration), 0xD0F)
    return jax.random.uniform(key, (n, 2), jnp.float32)
