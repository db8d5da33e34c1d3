"""Brute-force Hamming matching on the MXU via the bitplane-sign trick.

The reference's matching lives inside ORB-SLAM3 (Hamming distance over
256-bit BRIEF descriptors with window/rotation heuristics). On TPU,
all-pairs Hamming between two descriptor sets is one matmul:

    signs in {-1, +1}:  S = D1 @ D2^T  in [-256, 256]
    hamming = (256 - S) / 2

A (1024, 256) x (256, 1024) bf16 matmul is a single MXU pass — orders of
magnitude faster than bit-twiddling popcounts, and exactly equivalent.
`ops/hamming_pallas.py` fuses the distance + row-wise top-2 reduction into
one kernel so the (K1, K2) distance matrix never round-trips to HBM.

Selection applies the standard gates with static shapes:
  * best < `max_distance` (absolute Hamming threshold),
  * best < `ratio` * second-best (Lowe ratio, computed per row),
  * mutual cross-check (row argmin == col argmin).
Outputs are fixed-size index arrays with a validity mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Matches(NamedTuple):
    idx1: jax.Array  # (K,) int32 — index into set 1 (identity by default)
    idx2: jax.Array  # (K,) int32 — best match in set 2
    distance: jax.Array  # (K,) float32 Hamming distance
    valid: jax.Array  # (K,) bool


def hamming_matrix(signs1: jax.Array, signs2: jax.Array) -> jax.Array:
    """(K1, 256) x (K2, 256) sign descriptors -> (K1, K2) Hamming distances.

    bf16 sign matmul on the MXU; exact (values are small integers).
    """
    s = jnp.dot(
        signs1.astype(jnp.bfloat16),
        signs2.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    n_bits = signs1.shape[-1]
    return 0.5 * (n_bits - s)


def _use_pallas(backend: str, k1: int, k2: int) -> bool:
    if backend == "xla":
        return False
    if backend == "auto" and jax.default_backend() != "tpu":
        return False
    return k1 % 128 == 0 and k2 % 128 == 0


@functools.partial(
    jax.jit, static_argnames=("max_distance", "ratio", "cross_check", "backend")
)
def match(
    signs1: jax.Array,
    valid1: jax.Array,
    signs2: jax.Array,
    valid2: jax.Array,
    max_distance: float = 64.0,
    ratio: float = 0.9,
    cross_check: bool = True,
    backend: str = "auto",
) -> Matches:
    """Mutual-nearest Hamming matching with ratio test, fixed shapes.

    `backend="auto"` uses the fused Pallas top-2 kernel on TPU when both
    sets are 128-aligned (the framework's capacities are); results are
    identical to the XLA path (sign-matmul Hamming is integer-exact and
    both paths tie-break argmin to the first occurrence).
    """
    if _use_pallas(backend, signs1.shape[0], signs2.shape[0]):
        from slam_rgbd_tpu.ops.hamming_pallas import match_pallas

        idx1, idx2, dist, ok = match_pallas(
            signs1, valid1, signs2, valid2,
            max_distance=max_distance, ratio=ratio, cross_check=cross_check,
            interpret=jax.default_backend() != "tpu",
        )
        return Matches(idx1=idx1, idx2=idx2, distance=dist, valid=ok & valid1)

    d = hamming_matrix(signs1, signs2)  # (K1, K2)
    big = jnp.float32(1e9)
    d = jnp.where(valid1[:, None] & valid2[None, :], d, big)

    # Row-wise best and second-best.
    neg_top2, idx_top2 = jax.lax.top_k(-d, 2)  # top_k of negated = smallest
    best = -neg_top2[:, 0]
    second = -neg_top2[:, 1]
    best_j = idx_top2[:, 0]

    ok = (best < max_distance) & (best < ratio * second)

    if cross_check:
        col_best_i = jnp.argmin(d, axis=0)  # (K2,)
        ok = ok & (col_best_i[best_j] == jnp.arange(d.shape[0]))

    return Matches(
        idx1=jnp.arange(d.shape[0], dtype=jnp.int32),
        idx2=best_j.astype(jnp.int32),
        distance=best,
        valid=ok & valid1,
    )


def pack_to_signs(packed: jax.Array) -> jax.Array:
    """(K, 8) uint32 packed descriptors -> (K, 256) int8 sign matrix."""
    k = packed.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return jnp.where(bits.reshape(k, -1) > 0, jnp.int8(1), jnp.int8(-1))


def hamming_packed(packed1: jax.Array, packed2: jax.Array) -> jax.Array:
    """Reference popcount Hamming on packed descriptors (oracle for tests)."""
    x = packed1[:, None, :] ^ packed2[None, :, :]  # (K1, K2, 8) uint32
    # SWAR popcount per uint32 word
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    x = (x * jnp.uint32(0x01010101)) >> 24
    return jnp.sum(x, axis=-1).astype(jnp.float32)
