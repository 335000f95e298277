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


def pixel_jitter(base_key: jax.Array, iteration, n: int) -> jax.Array:
    """``[n, 2]`` sub-pixel jitter for antialiasing (extension: the reference
    generates rays through pixel corners with no jitter, `pathtrace.cu:278-282`)."""
    key = jax.random.fold_in(jax.random.fold_in(base_key, iteration), 0x7EA)
    return jax.random.uniform(key, (n, 2), jnp.float32)
