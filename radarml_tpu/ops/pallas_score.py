"""Pallas TPU kernel: fused scan→scores for the folded linear pipeline.

The folded predict path (models/pipeline.py `_build_folded`) reduces
per-target work to ⟨template_c, native plane slices⟩. The XLA
formulation gathers the three planes of every (scan, target) pair into
a (B·T, F) matrix in HBM, then matmuls — paying an extra HBM
write+read of the gathered features and a strided-gather for the
cube[:, j, :] and cube[:, :, k] slices.

This kernel removes both: the grid runs one step per scan, Pallas
pipelines each (X, Y, Z) cube block HBM→VMEM (contiguous streaming at
full bandwidth, double-buffered against compute), and the kernel
slices the planes for all T targets out of VMEM and contracts them
with the VMEM-resident templates directly. Per-scan traffic is exactly
one cube read; features never exist in HBM.

Target indices arrive as per-step (1, T, 3) SMEM blocks — small
enough to stay resident and never touched by the index maps.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_native_score"]


def _kernel(ijk_ref, cube_ref, txz_ref, tyz_ref, txy_ref, b_ref, out_ref):
    """One scan: score T targets against C class templates.

    cube_ref: (1, X, Y, Z) VMEM block of this scan's cube.
    t??_ref:  (C, ·, ·) plane templates (VMEM, whole array).
    b_ref:    (C,) intercept.
    out_ref:  (1, T, C) decisions.
    ijk_ref:  (1, T, 3) int32 SMEM block of this scan's target cells.
    """
    T = out_ref.shape[1]
    C = out_ref.shape[2]
    X, Y, Z = cube_ref.shape[1], cube_ref.shape[2], cube_ref.shape[3]
    cube = cube_ref[0]  # (X, Y, Z)
    for t in range(T):  # static unroll; T is small (≤8)
        i = ijk_ref[0, t, 0]
        j = ijk_ref[0, t, 1]
        k = ijk_ref[0, t, 2]
        # yz = cube[i, :, :] → dynamic index on an untiled dim: allowed.
        yz = cube_ref[0, pl.ds(i, 1), :, :][0, :, :]
        # Dynamic indices on the tiled (sublane/lane) dims are not
        # Mosaic-expressible for arbitrary offsets, and neither are
        # flattening reshapes — so the xz and xy slices become one-hot
        # MXU contractions with a leading-singleton result:
        # xz[x, z] = Σ_y 1[y == j]·cube[x, y, z],
        # xy[x, y] = Σ_z 1[z == k]·cube[x, y, z].
        oh_j = (
            jax.lax.broadcasted_iota(jnp.int32, (1, Y, 1), 1) == j
        ).astype(jnp.float32)
        xz = jnp.sum(cube * oh_j, axis=1)  # (X, Z)
        oh_k = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, Z), 2) == k
        ).astype(jnp.float32)
        xy = jnp.sum(cube * oh_k, axis=2)  # (X, Y)
        # Per-class template dot as an elementwise product + full
        # reduction on the VPU (C is tiny; no reshape needed), stored
        # as one row vector (scalar stores to VMEM are not allowed).
        dec = jnp.stack(
            [
                jnp.sum(txz_ref[c, :, :] * xz)
                + jnp.sum(tyz_ref[c, :, :] * yz)
                + jnp.sum(txy_ref[c, :, :] * xy)
                + b_ref[c]
                for c in range(C)
            ]
        )
        out_ref[0, t, :] = dec


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_native_score(
    cubes: jax.Array,
    ijk: jax.Array,
    tmpl_xz: jax.Array,
    tmpl_yz: jax.Array,
    tmpl_xy: jax.Array,
    intercept: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """(B, X, Y, Z) cubes + (B, T, 3) int32 cell indices → (B, T, C).

    Templates are (C, X, Z), (C, Y, Z), (C, X, Y) folded class
    templates (already /RADAR_MAX-scaled); intercept is (C,).
    """
    B, X, Y, Z = cubes.shape
    T = ijk.shape[1]
    C = intercept.shape[0]
    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, T, 3), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, X, Y, Z), lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        interpret=interpret,
    )(
        ijk.astype(jnp.int32),
        cubes.astype(jnp.float32),
        tmpl_xz.astype(jnp.float32),
        tmpl_yz.astype(jnp.float32),
        tmpl_xy.astype(jnp.float32),
        intercept.astype(jnp.float32),
    )
