"""Pallas TPU kernel: fused RBF Gram matrix exp(-γ‖x−s‖²).

The XLA formulation of RBF scoring (models/svc.kernel_matrix) computes
the (n, m) inner-product matrix on the MXU, then the squared-distance
expansion and exp as separate elementwise stages — each a round trip
of the (n, m) block through HBM. This kernel fuses the whole chain:
one MXU contraction per (row-tile × col-tile) grid step with the
norm-broadcast + exp epilogue applied while the tile is still in VMEM,
so the Gram matrix is written to HBM exactly once.

This is the kernel SURVEY.md §2.2 names for the SVC family
("pairwise-distance Pallas kernel for RBF"). Feature dim is loaded
whole per tile (the radar feature length ~10k floats ≈ 40 KB/row is
VMEM-friendly at the default 128-row tiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rbf_gram"]


def _kernel(x_ref, s_ref, gamma_ref, out_ref):
    x = x_ref[:]  # (Tn, F)
    s = s_ref[:]  # (Tm, F)
    g = jax.lax.dot_general(
        x, s,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tn, Tm)
    xx = jnp.sum(x * x, axis=1, keepdims=True)  # (Tn, 1)
    ss = jnp.sum(s * s, axis=1, keepdims=True)  # (Tm, 1)
    d2 = jnp.maximum(xx + ss.T - 2.0 * g, 0.0)
    out_ref[:] = jnp.exp(-gamma_ref[0] * d2)


@functools.partial(
    jax.jit, static_argnames=("tile_n", "tile_m", "interpret")
)
def rbf_gram(
    X: jax.Array,
    S: jax.Array,
    gamma: float,
    tile_n: int = 128,
    tile_m: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """(n, F) × (m, F) → (n, m) fused exp(-γ‖x−s‖²) Gram matrix.

    Inputs are zero-padded up to tile multiples; padding rows produce
    garbage lanes that are sliced away before returning (zero-padded
    features do not perturb real entries: they add 0 to every norm and
    inner product).
    """
    n, F = X.shape
    m = S.shape[0]
    X = X.astype(jnp.float32)
    S = S.astype(jnp.float32)
    n_pad = (-n) % tile_n
    m_pad = (-m) % tile_m
    if n_pad:
        X = jnp.pad(X, ((0, n_pad), (0, 0)))
    if m_pad:
        S = jnp.pad(S, ((0, m_pad), (0, 0)))
    N, M = X.shape[0], S.shape[0]
    grid = (N // tile_n, M // tile_m)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_n, F), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_m, F), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, tile_m), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
        interpret=interpret,
    )(X, S, jnp.asarray([gamma], jnp.float32))
    return out[:n, :m]
