"""Fused Hamming-matching Pallas kernel: MXU distance + on-chip top-2.

The XLA path (`features/match.py`) materializes the (K1, K2) distance
matrix in HBM and then runs `top_k` over it — two HBM round-trips of a
matrix that is pure intermediate state. This kernel fuses them: each grid
step loads a 128-row tile of query sign-descriptors into VMEM, runs the
(128, 256) x (256, K2) bf16 matmul on the MXU, and reduces best /
second-best / argmin in-register, so only (K1, 3) floats ever leave the
chip. For the map-association workload (K1=1024 queries vs K2=16384 map
points) that is 64 MB of HBM traffic saved per call.

Exactness: sign-matmul Hamming is integer-exact in bf16->f32 (values are
small integers), so results match `features.match.hamming_matrix` +
`top_k` bit-for-bit (tested in interpret mode and on hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128
_BIG = 1e9


def _row_tile(k1: int, cap: int = 512) -> int:
    """Largest multiple of 128 that divides k1 and is <= cap.

    MXU efficiency scales with the M dimension of the (M, 256) x (256, N)
    sign-matmul: 128-row steps leave the systolic array mostly idle and
    pay per-step pipeline overhead, so query tiles are as tall as the
    VMEM working set allows."""
    t = cap
    while t > _TILE and k1 % t:
        t -= _TILE
    return t


def _hamming_top2_kernel(s1_ref, s2t_ref, v1_ref, v2_ref,
                         best_ref, second_ref, idx_ref):
    """Grid (K1/R, K2/K2T); step j folds one column tile into the running
    top-2 for query-row tile i.

    s1_ref: (R, 256) bf16 signs; s2t_ref: (256, K2T) bf16 transposed
    signs; v1/v2: (R, 1) / (1, K2T) f32 validity; outputs (R, 1),
    revisited across j.
    """
    j = pl.program_id(1)
    n_bits = s1_ref.shape[1]
    s = jnp.dot(s1_ref[:], s2t_ref[:], preferred_element_type=jnp.float32)
    d = 0.5 * (n_bits - s)  # (R, K2T) Hamming distances
    invalid = (v1_ref[:] < 0.5) | (v2_ref[:] < 0.5)  # broadcast (R, K2T)
    d = jnp.where(invalid, _BIG, d)

    k2t = d.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, dimension=1) + j * k2t
    t1 = jnp.min(d, axis=1, keepdims=True)  # tile best
    # arg: smallest column index achieving the tile min
    n2 = pl.num_programs(1) * k2t
    ti = jnp.min(jnp.where(d <= t1, col, n2), axis=1, keepdims=True)
    # tile second-best: min over everything except that single column
    t2 = jnp.min(jnp.where(col == ti, _BIG, d), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        best_ref[:] = t1
        second_ref[:] = t2
        idx_ref[:] = ti

    @pl.when(j > 0)
    def _():
        b1, b2, bi = best_ref[:], second_ref[:], idx_ref[:]
        # merge running top-2 with tile top-2; strict '<' keeps the
        # EARLIER tile's index on ties (argmin first-occurrence semantics)
        better = t1 < b1
        idx_ref[:] = jnp.where(better, ti, bi)
        best_ref[:] = jnp.where(better, t1, b1)
        second_ref[:] = jnp.where(better, jnp.minimum(b1, t2),
                                  jnp.minimum(b2, t1))


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_top2(
    signs1: jax.Array,  # (K1, 256) int8 in {-1, +1}
    valid1: jax.Array,  # (K1,) bool
    signs2: jax.Array,  # (K2, 256) int8
    valid2: jax.Array,  # (K2,) bool
    interpret: bool = False,
):
    """Per-query (best_distance, second_distance, best_index) vs set 2.

    K1 and K2 must be multiples of 128 (the framework's fixed capacities
    are). Invalid rows/columns get distance 1e9 / index of some invalid
    column — callers gate on their own validity masks as usual.
    """
    k1, n_bits = signs1.shape
    k2 = signs2.shape[0]
    assert k1 % _TILE == 0, f"K1={k1} must be a multiple of {_TILE}"
    assert k2 % _TILE == 0, f"K2={k2} must be a multiple of {_TILE}"
    r = _row_tile(k1)
    k2t = _K2_TILE if k2 % _K2_TILE == 0 else _row_tile(k2, _K2_TILE)

    s1 = signs1.astype(jnp.bfloat16)
    s2t = signs2.astype(jnp.bfloat16).T  # (256, K2)
    v1 = valid1.astype(jnp.float32)[:, None]  # (K1, 1)
    v2 = valid2.astype(jnp.float32)[None, :]  # (1, K2)

    grid = (k1 // r, k2 // k2t)
    out_shape = (
        jax.ShapeDtypeStruct((k1, 1), jnp.float32),
        jax.ShapeDtypeStruct((k1, 1), jnp.float32),
        jax.ShapeDtypeStruct((k1, 1), jnp.int32),
    )
    row_spec = pl.BlockSpec((r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    best, second, idx = pl.pallas_call(
        _hamming_top2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, n_bits), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bits, k2t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(row_spec, row_spec, row_spec),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * k1 * k2 * n_bits,
            bytes_accessed=k1 * n_bits + k2 * n_bits + k1 * 12,
            transcendentals=0,
        ),
        interpret=interpret,
    )(s1, s2t, v1, v2)
    return best[:, 0], second[:, 0], idx[:, 0]


def match_pallas(
    signs1, valid1, signs2, valid2,
    max_distance: float = 64.0,
    ratio: float = 0.9,
    cross_check: bool = True,
    interpret: bool = False,
):
    """Drop-in for `features.match.match` using the fused kernel.

    Cross-check runs the kernel once more with the operands swapped
    (columns never materialize, so mutual-nearest costs a second matmul
    pass instead of an HBM-resident distance matrix). Returns a
    `features.match.Matches`-shaped tuple (idx1, idx2, distance, valid).
    """
    best, second, idx = hamming_top2(
        signs1, valid1, signs2, valid2, interpret=interpret
    )
    ok = (best < max_distance) & (best < ratio * second) & valid1
    if cross_check:
        _, _, idx_rev = hamming_top2(
            signs2, valid2, signs1, valid1, interpret=interpret
        )
        ok = ok & (idx_rev[idx] == jnp.arange(signs1.shape[0]))
    return (
        jnp.arange(signs1.shape[0], dtype=jnp.int32),
        idx.astype(jnp.int32),
        best,
        ok,
    )


# =========================================================================
# Gated map-association kernel
# =========================================================================

_K2_TILE = 2048  # map-point tile: (256, 2048) bf16 signs + (128, 2048) f32
# distances stay comfortably inside VMEM at any map capacity


def _make_gated_kernel(n_bits, px_radius, z_rel_tol, merge_radius, n2):
    px2 = px_radius * px_radius
    # signed square: merge_radius < 0 disables tier 2 outright (dist^2 can
    # be epsilon-negative for coincident points, so 0 is not a safe "off")
    mr2 = merge_radius * abs(merge_radius)

    def kernel(s1_ref, q_ref, s2t_ref, p_ref,
               d1_ref, i1_ref, d2_ref, i2_ref):
        """Grid (K1/R, K2/_K2_TILE); j revisits the i-th output rows.

        q_ref: (R, 8) f32 [u, v, z, valid, xw, yw, zw, |pw|^2]
        p_ref: (8, K2T) f32 [pu, pv, z, ok, x, y, z, |p|^2]
        Outputs (R, 1): tier-1 (pixel+depth gate) best distance/index,
        tier-2 (3D merge gate) best distance/index.
        """
        j = pl.program_id(1)
        s = jnp.dot(s1_ref[:], s2t_ref[:], preferred_element_type=jnp.float32)
        d = 0.5 * (n_bits - s)  # (TILE, K2T) Hamming

        q = q_ref[:]
        p = p_ref[:]
        base_ok = (q[:, 3:4] > 0.5) & (p[3:4, :] > 0.5)
        d = jnp.where(base_ok, d, _BIG)

        # tier 1: reprojection pixel gate + relative depth agreement
        du = q[:, 0:1] - p[0:1, :]
        dv = q[:, 1:2] - p[1:2, :]
        z_ok = jnp.abs(q[:, 2:3] - p[2:3, :]) < z_rel_tol * jnp.maximum(
            q[:, 2:3], 0.3
        )
        d1 = jnp.where((du * du + dv * dv < px2) & z_ok, d, _BIG)

        # tier 2: 3D world-distance gate (merge / spawn suppression);
        # dist^2 via the matmul identity — the (TILE, 3) x (3, K2T) cross
        # term is one more MXU pass, nothing materializes in HBM.
        cross = jnp.dot(q[:, 4:7], p[4:7, :], preferred_element_type=jnp.float32)
        dist2 = q[:, 7:8] + p[7:8, :] - 2.0 * cross
        d2 = jnp.where(dist2 < mr2, d, _BIG)

        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + j * d.shape[1]

        def block_min(dm):
            best = jnp.min(dm, axis=1, keepdims=True)
            idx = jnp.min(
                jnp.where(dm <= best, col, jnp.int32(n2)), axis=1, keepdims=True
            )
            return best, idx

        b1, ix1 = block_min(d1)
        b2, ix2 = block_min(d2)

        @pl.when(j == 0)
        def _():
            d1_ref[:], i1_ref[:] = b1, ix1
            d2_ref[:], i2_ref[:] = b2, ix2

        @pl.when(j > 0)
        def _():
            # strict '<' keeps the EARLIER block's index on ties, matching
            # jnp.argmin's first-occurrence semantics
            for d_ref, i_ref, b, ix in ((d1_ref, i1_ref, b1, ix1),
                                        (d2_ref, i2_ref, b2, ix2)):
                better = b < d_ref[:]
                i_ref[:] = jnp.where(better, ix, i_ref[:])
                d_ref[:] = jnp.where(better, b, d_ref[:])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("px_radius", "z_rel_tol", "merge_radius", "interpret"),
)
def gated_match(
    signs1: jax.Array,  # (K1, 256) int8 query descriptors
    q_meta: jax.Array,  # (K1, 8) f32 [u, v, z, valid, xw, yw, zw, |pw|^2]
    signs2: jax.Array,  # (K2, 256) int8 map descriptors
    p_meta: jax.Array,  # (K2, 8) f32 [pu, pv, z, ok, x, y, z, |p|^2]
    px_radius: float = 6.0,
    z_rel_tol: float = 0.08,
    merge_radius: float = 0.05,
    interpret: bool = False,
):
    """Fused two-tier gated matching for `mapping.map.match_against_map`.

    One kernel computes Hamming distances on the MXU and applies BOTH
    association tiers in VMEM — the reprojection pixel/depth gate (BA
    observations) and the 3D merge gate (duplicate suppression) — so the
    (K1, K2) distance matrix and the five gate matrices of the XLA path
    never reach HBM. Returns (d1, idx1, d2, idx2), each (K1,); callers
    apply their descriptor-distance thresholds.
    """
    k1, n_bits = signs1.shape
    k2 = signs2.shape[0]
    assert k1 % _TILE == 0, f"K1={k1} must be a multiple of {_TILE}"
    k2t = min(_K2_TILE, k2)
    assert k2 % k2t == 0, f"K2={k2} must be a multiple of {k2t}"
    r = _row_tile(k1)

    s1 = signs1.astype(jnp.bfloat16)
    s2t = signs2.astype(jnp.bfloat16).T  # (256, K2)
    pm = p_meta.T  # (8, K2)

    grid = (k1 // r, k2 // k2t)
    kernel = _make_gated_kernel(n_bits, px_radius, z_rel_tol, merge_radius, k2)
    out_shape = (
        jax.ShapeDtypeStruct((k1, 1), jnp.float32),
        jax.ShapeDtypeStruct((k1, 1), jnp.int32),
        jax.ShapeDtypeStruct((k1, 1), jnp.float32),
        jax.ShapeDtypeStruct((k1, 1), jnp.int32),
    )
    row_spec = pl.BlockSpec((r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    d1, i1, d2, i2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, n_bits), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bits, k2t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k2t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(row_spec, row_spec, row_spec, row_spec),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * k1 * k2 * (n_bits + 3),
            bytes_accessed=(k1 + k2) * (n_bits * 2 + 32) + k1 * 16,
            transcendentals=0,
        ),
        interpret=interpret,
    )(s1, q_meta, s2t, pm)
    return d1[:, 0], i1[:, 0], d2[:, 0], i2[:, 0]
