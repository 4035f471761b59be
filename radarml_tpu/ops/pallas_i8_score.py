"""One-HBM-pass int8 Pallas kernel for the folded scan-scoring tables.

The folded predict path (models/pipeline.py `_build_folded`) scores a
target by three table lookups after contracting the whole cube against
each per-plane class template: M1[c, y] = Σ_xz A_xz[c,x,z]·cube[x,y,z]
(and M2 over x, M3 over z); a target at cell (i, j, k) reads
M1[c, j] + M2[c, i] + M3[c, k] + b_c. It replaces the per-target loop
of the reference (/root/reference/predict.py:72-131).

The 3-einsum XLA formulation reads the cube stream once PER TABLE
(the three contractions keep different free axes), measured at ~89%
of HBM in aggregate — its ceiling is ~2.3M scans/s on a v5e
(benchmarks/contraction_probe.py; README "why ~2M is the floor" —
a floor this kernel is built to break). This kernel computes all
three tables in ONE pass over an int8 cube stream:

  * Layout: the scan batch is packed scan-minor as a 2-D int8 array
    `(X·Yp, Z·B)` — rows ordered (g, x, y%Yg) over NG = Yp/Yg
    y-groups (one full group = plain x·Yp+y), with y zero-padded to
    the int8 sublane tile (31→32 costs +3.2%, and the pad rows
    multiply zero weight columns so their values never matter),
    columns z·B + b. Both physical tile dims are dense — no hidden
    layout padding, unlike any (…, Z=176) minor-dim view, which
    Mosaic would pad 176→256 lanes (+45% HBM). The PRODUCTION wire
    format (models/pipeline._pack_y_group) is the y-grouped order
    for every fused tail, so one packed batch serves any kernel
    here — weights build with the matching K-axis permutation.
  * Grid: one step per z-slice. Each step loads `(X·Yp, B)` — ALL
    scans ride the MXU lane dimension, so every contraction is a
    plain big-K matmul `(M, 704) @ (704, B)`; nothing per-scan, no
    small-K dots, no C-column tile waste (the failure mode of
    ops/pallas_score.py, whose C=3-column passes idle >97% of the
    MXU).
  * Per step, three s8×s8→s32 MXU dots against weights streamed
    per-z from HBM (+~14% HBM over the cube — they are read once
    per batch):
      W1[z] (C2·Yp, X·Yp) = δ_{y,y'}·Qxz[c,x,z]  → M1 rows (c,y)
      W2[z] (C2·X,  X·Yp) = δ_{x,x'}·Qyz[c,y,z]  → M2 rows (c,x)
      W3    (C2,    X·Yp) = Qxy[c,x,y]           → M3[z] rows c
    M1/M2 accumulate in their VMEM-resident output blocks (constant
    index maps) across the z grid; M3 writes one row-block per step.
  * Templates are the error-compensated per-class int8 pairs of
    models/pipeline._quantized_split_templates (hi + lo concatenated
    on the class axis, C2 = 2C); the int32 tables dequantize outside
    the kernel as s1·hi + s2·lo + 128·Σt (the cube wire format is
    value-128, exactly like cube_dtype="int8").

Three kernels share the design and differ in how much of the
per-target lookup tail they absorb (models/pipeline fused_tail):

  * onepass_tables_i8 — emits the raw m1/m2/m3 tables; the XLA tail
    reads them with lane-wise masked sums.
  * onepass_tables_sel_i8 — the z-table (the largest, (Z, C2, B))
    never reaches HBM: each step compares the per-target z indices
    against program_id and accumulates only matching rows, expanding
    the C2-row xy dot per target slot on the VPU.
  * onepass_scores_i8 — ALL lookups in-kernel over a y-GROUPED
    (Z, NG) grid (GroupedWeights): the δ_{y,y'} block-diagonal xz
    weights waste MACs proportional to the y span per block and the
    kernel is MXU-bound, so splitting y into Yg=16 groups cuts total
    MXU work ~30%; m1 accumulates per group in VMEM scratch, m2
    across the whole grid, and the last step selects every target's
    rows with full-row masked sums against precomputed row indices.
    Only three (C2·Tp, B) score blocks reach HBM — the XLA tail is
    dequantize + calibrate on scalars.

Arithmetic is exact in all three: int8 inputs, int32 accumulation —
the only error vs float64 tables is the template quantization already
shared with the fast int8 path (~1e-5 relative on decisions).

Status of the in-kernel-selection variants (decided, round 5): the
`sel`/`sel3` kernels lose to the lookup-family tails in every
interleaved hardware round (README "the fused-tail experiment": the
per-target VPU selection serializes against the MXU dots in all 176
grid steps to save an HBM round-trip worth ≤ ~7% of the cube read)
and are KEPT FIRST-CLASS anyway — not as an accretion, but because
(a) they are the only in-repo exercise of dynamic-vs-program_id row
selection and VMEM scratch accumulation under Mosaic, the capability
probes a future in-kernel tail would start from; (b) their parity
tests pin the wire format from a second angle (one packed batch must
score identically through every tail); and (c) `bench.py` times them
every round, so the "lookup-family wins" claim stays a measured fact
rather than a frozen one. The cost of keeping them is ~670 LoC that
share all infrastructure with the winners; no serving path selects
them by default.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "OnepassWeights",
    "pack_cubes_i8",
    "pack_cubes_i8_device",
    "build_onepass_weights",
    "onepass_tables_i8",
    "onepass_tables_sel_i8",
    "onepass_tables_grouped_i8",
    "CombinedWeights",
    "build_combined_weights",
    "onepass_tables_combined_i8",
    "GroupedWeights",
    "best_y_group",
    "build_grouped_weights",
    "onepass_scores_i8",
    "SEL_TP",
]

_SUBLANE = 32  # int8 sublane tile
_LANE = 128  # lane tile


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


class OnepassWeights(NamedTuple):
    """Device operands for the one-pass kernel (see module docstring)."""

    w1: jax.Array  # (Z, C2·Yp, X·Yp) int8 — per-z xz weights
    w2: jax.Array  # (Z, C2·X, X·Yp) int8 — per-z yz weights
    w3: jax.Array  # (C2, X·Yp) int8 — xy weights (z-constant)
    dims: Tuple[int, int, int, int]  # (X, Y, Z, C)


def pack_cubes_i8(
    cubes: np.ndarray, y_group: Optional[int] = None
) -> np.ndarray:
    """(B, X, Y, Z) integer-valued cubes → (X·Yp, Z·B) int8, value-128.

    Host-side packing for the kernel's scan-minor layout. Accepts
    uint8 (zero-copy xor-msb reinterpret), int8 wire format
    (already value-128), or any 0..255 integer-valued array.

    y_group (default: one full-Yp group) splits the y rows into
    NG = Yp/Yg groups for the grouped scores kernel: row order becomes
    (g, x, y%Yg) instead of (x, y) — same byte count, and identical
    bytes when y_group=Yp. Must match the kernel weights' y_group.
    """
    cubes = np.asarray(cubes)
    if cubes.dtype == np.int8:
        v = cubes
    else:
        u8 = cubes if cubes.dtype == np.uint8 else cubes.astype(np.uint8)
        v = (u8 ^ np.uint8(0x80)).view(np.int8)
    B, X, Y, Z = v.shape
    Yp = _round_up(Y, _SUBLANE)
    Yg = y_group or Yp
    NG = Yp // Yg
    Bp = _round_up(B, _LANE)  # scan lanes must tile; pads are unread
    out = np.zeros((X, Yp, Z, Bp), np.int8)
    out[:, :Y, :, :B] = np.transpose(v, (1, 2, 3, 0))
    out = out.reshape(X, NG, Yg, Z, Bp).transpose(1, 0, 2, 3, 4)
    return np.ascontiguousarray(out).reshape(X * Yp, Z * Bp)


@functools.partial(jax.jit, static_argnames=("y_group",))
def pack_cubes_i8_device(
    cubes: jax.Array, y_group: Optional[int] = None
) -> jax.Array:
    """Device-side pack: (B, X, Y, Z) int8 (value-128) → (X·Yp, Z·B).

    One extra device pass over the stream — use host packing where
    the batch originates on host (serving ingest packs for free).
    y_group as in pack_cubes_i8.
    """
    B, X, Y, Z = cubes.shape
    Yp = _round_up(Y, _SUBLANE)
    Yg = y_group or Yp
    NG = Yp // Yg
    Bp = _round_up(B, _LANE)
    t = jnp.transpose(cubes, (1, 2, 3, 0))
    t = jnp.pad(t, ((0, 0), (0, Yp - Y), (0, 0), (0, Bp - B)))
    t = t.reshape(X, NG, Yg, Z, Bp).transpose(1, 0, 2, 3, 4)
    return t.reshape(X * Yp, Z * Bp)


def build_onepass_weights(
    quant: Sequence[Optional[tuple]],
    dims: Tuple[int, int, int],
    y_group: Optional[int] = None,
) -> OnepassWeights:
    """Per-z block-structured int8 weights from quantized templates.

    quant: the three per-plane entries of
    models/pipeline.RadarPredictor._quantized_split_templates
    (q (2C,·,·) int8, s1, s2, const) — None for a masked plane, whose
    weights stay zero so the plane contributes nothing.
    dims: (X, Y, Z) of the scan arena grid.
    y_group: wire-layout row order of the packed cubes these weights
    will contract against (pack_cubes_i8's y_group): the contraction
    axis column order is (g, x, y%Yg) instead of (x, y). Output rows
    and results are identical — only the K-axis permutation changes.
    Lets every fused tail share ONE wire layout (the grouped one the
    sel3 kernel needs), so a batch packed once serves any tail.
    """
    X, Y, Z = dims
    Yp = _round_up(Y, _SUBLANE)
    Yg = y_group or Yp
    if Yp % Yg:
        raise ValueError(f"y_group {Yg} must divide Yp {Yp}")
    NG = Yp // Yg
    C2 = next(np.asarray(q[0]).shape[0] for q in quant if q is not None)
    w1 = np.zeros((Z, C2 * Yp, X * Yp), np.int8)
    w2 = np.zeros((Z, C2 * X, X * Yp), np.int8)
    w3 = np.zeros((C2, X * Yp), np.int8)
    if quant[0] is not None:  # xz plane: (C2, X, Z)
        q = np.asarray(quant[0][0])
        qz = np.transpose(q, (2, 0, 1))  # (Z, C2, X)
        w1v = w1.reshape(Z, C2, Yp, NG, X, Yg)
        for y in range(Y):  # w1[z, c·Yp + y, col(x, y)] = q[c, x, z]
            w1v[:, :, y, y // Yg, :, y % Yg] = qz
    if quant[1] is not None:  # yz plane: (C2, Y, Z)
        q = np.asarray(quant[1][0])
        w2v = w2.reshape(Z, C2, X, NG, X, Yg)
        for x in range(X):  # w2[z, c·X + x, col(x, y)] = q[c, y, z]
            for g in range(NG):
                ys = min(Y - g * Yg, Yg)
                if ys > 0:
                    w2v[:, :, x, g, x, :ys] = np.transpose(
                        q[:, g * Yg:g * Yg + ys, :], (2, 0, 1)
                    )
    if quant[2] is not None:  # xy plane: (C2, X, Y)
        q = np.asarray(quant[2][0])
        w3v = w3.reshape(C2, NG, X, Yg)
        for g in range(NG):
            ys = min(Y - g * Yg, Yg)
            if ys > 0:
                w3v[:, g, :, :ys] = q[:, :, g * Yg:g * Yg + ys]
    return OnepassWeights(
        w1=jnp.asarray(w1),
        w2=jnp.asarray(w2),
        w3=jnp.asarray(w3),
        dims=(X, Y, Z, C2 // 2),
    )


SEL_TP = 8  # target-slot rows pad to the int32 sublane tile


def _kernel_sel(
    C2, Tp,
    cube_ref, w1_ref, w2_ref, w3_ref, kidx_ref, o1_ref, o2_ref, o3_ref,
):
    """Variant of _kernel that selects the z-table rows in-kernel.

    kidx (Tp, B) holds each scan's per-target z index, VMEM-resident
    across the whole grid (constant index map). Each step computes
    the C2-row xy dot ONCE (no replicated MXU rows) and expands it
    per target slot with a VPU broadcast-multiply against the
    `kidx == z` mask, so only the rows whose target sits in this
    z-slice accumulate — the (Z, C2, B) table never round-trips HBM,
    nor does its masked-sum lookup tail.
    """
    z = pl.program_id(0)
    blk = cube_ref[...]  # (X·Yp, B) int8 — this z-slice, all scans
    dn = (((1,), (0,)), ((), ()))

    def dot(w):
        return jax.lax.dot_general(
            w, blk, dn, preferred_element_type=jnp.int32
        )

    p1 = dot(w1_ref[0])
    p2 = dot(w2_ref[0])
    p3c = dot(w3_ref[...])  # (C2, B)
    m = (kidx_ref[...] == z).astype(jnp.int32)  # (Tp, B)
    p3 = (p3c[:, None, :] * m[None, :, :]).reshape(C2 * Tp, p3c.shape[-1])

    @pl.when(z == 0)
    def _init():
        o1_ref[...] = p1
        o2_ref[...] = p2
        o3_ref[...] = p3

    @pl.when(z != 0)
    def _acc():
        o1_ref[...] += p1
        o2_ref[...] += p2
        o3_ref[...] += p3


def onepass_tables_sel_i8(
    cube_k: jax.Array,
    weights: OnepassWeights,
    kidx: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One-pass tables with the z-table lookup folded into the kernel.

    kidx: (B, T) int32 per-target z indices (use -1 for padded target
    slots — matches no z-step, so their rows stay zero). Returns
    (m1 (C2, Yp, B), m2 (C2, X, B), d3 (C2, Tp, B)) where
    d3[c, t, b] = M3[kidx[b, t], c, b] — the raw per-target z-table
    read, already selected; slice [:, :T, :] and dequantize like m3.
    """
    return _onepass_tables_sel_i8(
        cube_k, weights.w1, weights.w2, weights.w3, kidx,
        dims=weights.dims, interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("dims", "interpret"))
def _onepass_tables_sel_i8(
    cube_k: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    w3: jax.Array,
    kidx: jax.Array,
    dims: Tuple[int, int, int, int],
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    X, Y, Z, C = dims
    C2 = 2 * C
    Yp = _round_up(Y, _SUBLANE)
    XYp, ZB = cube_k.shape
    if XYp != X * Yp or ZB % Z:
        raise ValueError(f"packed cube shape {cube_k.shape} does not "
                         f"match arena dims {(X, Y, Z)}")
    B = ZB // Z
    Xr = w2.shape[1] // C2
    T = kidx.shape[1]
    Tp = _round_up(T, SEL_TP)
    kt = jnp.pad(
        kidx.T.astype(jnp.int32), ((0, Tp - T), (0, B - kidx.shape[0])),
        constant_values=-1,
    )  # (Tp, B)
    m1, m2, d3 = pl.pallas_call(
        functools.partial(_kernel_sel, C2, Tp),
        grid=(Z,),
        in_specs=[
            pl.BlockSpec((XYp, B), lambda z: (0, z), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, C2 * Yp, XYp), lambda z: (z, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, C2 * Xr, XYp), lambda z: (z, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C2, XYp), lambda z: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Tp, B), lambda z: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((C2 * Yp, B), lambda z: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C2 * Xr, B), lambda z: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C2 * Tp, B), lambda z: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C2 * Yp, B), jnp.int32),
            jax.ShapeDtypeStruct((C2 * Xr, B), jnp.int32),
            jax.ShapeDtypeStruct((C2 * Tp, B), jnp.int32),
        ],
        interpret=interpret,
    )(cube_k, w1, w2, w3, kt)
    return (
        m1.reshape(C2, Yp, B),
        m2.reshape(C2, Xr, B),
        d3.reshape(C2, Tp, B),
    )


def _kernel(cube_ref, w1_ref, w2_ref, w3_ref, o1_ref, o2_ref, o3_ref):
    z = pl.program_id(0)
    blk = cube_ref[...]  # (X·Yp, B) int8 — this z-slice, all scans
    dn = (((1,), (0,)), ((), ()))

    def dot(w):
        return jax.lax.dot_general(
            w, blk, dn, preferred_element_type=jnp.int32
        )

    p1 = dot(w1_ref[0])
    p2 = dot(w2_ref[0])
    o3_ref[0] = dot(w3_ref[...])

    @pl.when(z == 0)
    def _init():
        o1_ref[...] = p1
        o2_ref[...] = p2

    @pl.when(z != 0)
    def _acc():
        o1_ref[...] += p1
        o2_ref[...] += p2


def onepass_tables_i8(
    cube_k: jax.Array,
    weights: OnepassWeights,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(X·Yp, Z·B) packed int8 cubes → raw int32 contraction tables.

    Returns (m1 (C2, Yp, B), m2 (C2, X, B), m3 (Z, C2, B)) int32 —
    quantized-template contractions against the value-128 stream;
    dequantize with the plane scales (see module docstring).
    """
    return _onepass_tables_i8(
        cube_k, weights.w1, weights.w2, weights.w3,
        dims=weights.dims, interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("dims", "interpret"))
def _onepass_tables_i8(
    cube_k: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    w3: jax.Array,
    dims: Tuple[int, int, int, int],
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    X, Y, Z, C = dims
    C2 = 2 * C
    Yp = _round_up(Y, _SUBLANE)
    XYp, ZB = cube_k.shape
    if XYp != X * Yp or ZB % Z:
        raise ValueError(f"packed cube shape {cube_k.shape} does not "
                         f"match arena dims {(X, Y, Z)}")
    B = ZB // Z
    Xr = w2.shape[1] // C2
    m1, m2, m3 = pl.pallas_call(
        _kernel,
        grid=(Z,),
        in_specs=[
            pl.BlockSpec((XYp, B), lambda z: (0, z), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, C2 * Yp, XYp), lambda z: (z, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, C2 * Xr, XYp), lambda z: (z, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((C2, XYp), lambda z: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C2 * Yp, B), lambda z: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C2 * Xr, B), lambda z: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2, B), lambda z: (z, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C2 * Yp, B), jnp.int32),
            jax.ShapeDtypeStruct((C2 * Xr, B), jnp.int32),
            jax.ShapeDtypeStruct((Z, C2, B), jnp.int32),
        ],
        interpret=interpret,
    )(cube_k, w1, w2, w3)
    return m1.reshape(C2, Yp, B), m2.reshape(C2, Xr, B), m3




class GroupedWeights(NamedTuple):
    """Operands for the y-grouped full-scoring kernel.

    The y axis splits into NG groups of Yg rows (NG·Yg = Yp), shrinking
    each step's contraction from K = X·Yp to K = X·Yg. The xz weights'
    δ_{y,y'} block-diagonal wastes MACs proportional to the y span per
    block, so smaller groups cut dense-MXU waste: at Yg=16 the m1 dot
    drops from 192×704 to 96×352 per z-slice-equivalent (~2× fewer
    MACs) while m2/m3 MACs stay constant — ~30% less total MXU work
    for the DEFAULT_ARENA shapes.
    """

    w1: jax.Array  # (Z, NG, C2·Yg, X·Yg) int8 — per-(z, group) xz
    w2: jax.Array  # (Z, NG, C2·X, X·Yg) int8 — per-(z, group) yz
    w3: jax.Array  # (NG, C2, X·Yg) int8 — per-group xy (z-constant)
    dims: Tuple[int, int, int, int]  # (X, Y, Z, C)
    y_group: int


def best_y_group(X: int, Y: int) -> int:
    """Largest MXU win the tiling allows: Yg=16 when the grouped row
    blocks stay int8-sublane aligned, else one full-Yp group."""
    Yp = _round_up(Y, _SUBLANE)
    if Yp % 16 == 0 and (X * 16) % _SUBLANE == 0:
        return 16
    return Yp


def _grouped_weight_arrays(
    quant: Sequence[Optional[tuple]],
    dims: Tuple[int, int, int],
    y_group: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Host-side grouped weight arrays shared by the grouped and
    combined builders: (w1, w2, w3, C2, Yg) numpy int8."""
    X, Y, Z = dims
    Yp = _round_up(Y, _SUBLANE)
    Yg = y_group or best_y_group(X, Y)
    if Yp % Yg or (X * Yg) % _SUBLANE:
        raise ValueError(
            f"y_group {Yg} must divide Yp {Yp} with X*Yg a multiple "
            f"of {_SUBLANE} (X={X})"
        )
    NG = Yp // Yg
    C2 = next(np.asarray(q[0]).shape[0] for q in quant if q is not None)
    w1 = np.zeros((Z, NG, C2 * Yg, X * Yg), np.int8)
    w2 = np.zeros((Z, NG, C2 * X, X * Yg), np.int8)
    w3 = np.zeros((NG, C2, X * Yg), np.int8)
    if quant[0] is not None:  # xz plane: (C2, X, Z)
        qz = np.transpose(np.asarray(quant[0][0]), (2, 0, 1))  # (Z, C2, X)
        w1v = w1.reshape(Z, NG, C2, Yg, X, Yg)
        for y in range(Y):  # w1[z, g, c·Yg+y', x·Yg+y'] = q[c, x, z]
            w1v[:, y // Yg, :, y % Yg, :, y % Yg] = qz
    if quant[1] is not None:  # yz plane: (C2, Y, Z)
        q = np.asarray(quant[1][0])
        w2v = w2.reshape(Z, NG, C2, X, X, Yg)
        for x in range(X):  # w2[z, g, c·X+x, x·Yg+y'] = q[c, g·Yg+y', z]
            for g in range(NG):
                ys = min(Y - g * Yg, Yg)
                if ys > 0:
                    w2v[:, g, :, x, x, :ys] = np.transpose(
                        q[:, g * Yg:g * Yg + ys, :], (2, 0, 1)
                    )
    if quant[2] is not None:  # xy plane: (C2, X, Y)
        q = np.asarray(quant[2][0])
        w3v = w3.reshape(NG, C2, X, Yg)
        for g in range(NG):
            ys = min(Y - g * Yg, Yg)
            if ys > 0:
                w3v[g, :, :, :ys] = q[:, :, g * Yg:g * Yg + ys]
    return w1, w2, w3, C2, Yg


def build_grouped_weights(
    quant: Sequence[Optional[tuple]],
    dims: Tuple[int, int, int],
    y_group: Optional[int] = None,
) -> GroupedWeights:
    """Grouped-layout int8 weights (see GroupedWeights) from the
    quantized templates of build_onepass_weights."""
    X, Y, Z = dims
    w1, w2, w3, C2, Yg = _grouped_weight_arrays(quant, dims, y_group)
    return GroupedWeights(
        w1=jnp.asarray(w1), w2=jnp.asarray(w2), w3=jnp.asarray(w3),
        dims=(X, Y, Z, C2 // 2), y_group=Yg,
    )


def _kernel_grouped_tables(
    C2,
    cube_ref, w1_ref, w2_ref, w3_ref, o1_ref, o2_ref, o3_ref,
):
    """Grouped-dot variant of _kernel: same raw tables, ~29% fewer MACs.

    The ungrouped w1 dot is a δ_{y,y'} block-diagonal (C2·Yp, X·Yp)
    contraction — 97% structural zeros ground through the MXU. At
    batch 2048 the one-pass kernel is MXU-BOUND (83.8G MACs ≈ 0.42 ms
    at v5e int8 peak ≈ the measured tables-only rate), so splitting y
    into NG groups shrinks the w1 dot from (C2·Yp, X·Yp) to NG ×
    (C2·Yg, X·Yg) — MACs ∝ Yg — while w2/w3 MACs stay constant.
    Unlike _kernel_scores (the sel3 kernel), NOTHING else moves
    in-kernel: no per-step VPU select/broadcast (sel3's measured
    regression), just three MXU dots per (z, group) step and the same
    XLA lookup tail as _kernel.

    m1 accumulates per-group via a dynamic leading index on the
    VMEM-resident output (constant index map); m2 across the whole
    grid; m3's z-row block persists across the minor g steps.
    """
    z = pl.program_id(0)
    g = pl.program_id(1)
    blk = cube_ref[...]  # (X·Yg, B) int8 — this (z, group), all scans
    dn = (((1,), (0,)), ((), ()))

    def dot(w):
        return jax.lax.dot_general(
            w, blk, dn, preferred_element_type=jnp.int32
        )

    p1 = dot(w1_ref[0, 0])
    p2 = dot(w2_ref[0, 0])
    p3 = dot(w3_ref[0])  # (C2, B)

    @pl.when(z == 0)
    def _init1():
        o1_ref[g] = p1

    @pl.when(z != 0)
    def _acc1():
        o1_ref[g] += p1

    first = jnp.logical_and(z == 0, g == 0)

    @pl.when(first)
    def _init2():
        o2_ref[...] = p2

    @pl.when(jnp.logical_not(first))
    def _acc2():
        o2_ref[...] += p2

    @pl.when(g == 0)
    def _init3():
        o3_ref[0] = p3

    @pl.when(g != 0)
    def _acc3():
        o3_ref[0] += p3


def onepass_tables_grouped_i8(
    cube_k: jax.Array,
    weights: GroupedWeights,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One-pass raw tables via grouped dots (see _kernel_grouped_tables).

    Same contract as onepass_tables_i8 — returns (m1 (C2, Yp, B),
    m2 (C2, X, B), m3 (Z, C2, B)) int32, identical values — but takes
    GroupedWeights and runs the MAC-lean (Z, NG) grid. The group-major
    m1 block ungroups with one cheap XLA transpose.
    """
    if not isinstance(weights, GroupedWeights):
        raise TypeError("onepass_tables_grouped_i8 takes GroupedWeights "
                        "(build_grouped_weights)")
    X, Y, Z, C = weights.dims
    C2 = 2 * C
    Yp = _round_up(Y, _SUBLANE)
    Yg = weights.y_group
    NG = Yp // Yg
    m1g, m2, m3 = _onepass_tables_grouped_i8(
        cube_k, weights.w1, weights.w2, weights.w3,
        dims=weights.dims, y_group=Yg, interpret=interpret,
    )
    m1 = (
        m1g.reshape(NG, C2, Yg, m1g.shape[-1])
        .transpose(1, 0, 2, 3)
        .reshape(C2, Yp, m1g.shape[-1])
    )
    return m1, m2.reshape(C2, X, m2.shape[-1]), m3


@functools.partial(
    jax.jit, static_argnames=("dims", "y_group", "interpret")
)
def _onepass_tables_grouped_i8(
    cube_k: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    w3: jax.Array,
    dims: Tuple[int, int, int, int],
    y_group: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    X, Y, Z, C = dims
    C2 = 2 * C
    Yp = _round_up(Y, _SUBLANE)
    Yg = y_group
    NG = Yp // Yg
    XYp, ZB = cube_k.shape
    if XYp != X * Yp or ZB % Z:
        raise ValueError(f"packed cube shape {cube_k.shape} does not "
                         f"match arena dims {(X, Y, Z)}")
    B = ZB // Z
    m1g, m2, m3 = pl.pallas_call(
        functools.partial(_kernel_grouped_tables, C2),
        grid=(Z, NG),
        in_specs=[
            pl.BlockSpec(
                (X * Yg, B), lambda z, g: (g, z), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, C2 * Yg, X * Yg), lambda z, g: (z, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, C2 * X, X * Yg), lambda z, g: (z, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, C2, X * Yg), lambda z, g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((NG, C2 * Yg, B), lambda z, g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2 * X, B), lambda z, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2, B), lambda z, g: (z, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NG, C2 * Yg, B), jnp.int32),
            jax.ShapeDtypeStruct((C2 * X, B), jnp.int32),
            jax.ShapeDtypeStruct((Z, C2, B), jnp.int32),
        ],
        interpret=interpret,
    )(cube_k, w1, w2, w3)
    return m1g, m2, m3


_ACC = 8  # int32 sublane tile — row-segment boundaries must align


class CombinedWeights(NamedTuple):
    """Operands for the single-dot grouped kernel.

    The grouped kernel's three per-step dots have M = C2·Yg, C2·X and
    C2 rows (96 / 132 / 6 at the default arena, Yg=16). The MXU tiles
    M in 128-row passes, so those dots cost 1+2+1 = 4 M-tile passes
    per step while carrying 234 useful rows — the C2-row xy dot wastes
    95% of its pass, and the yz dot's second pass carries 4 rows.
    Stacking all three weight blocks into ONE (M, X·Yg) operand makes
    every step a single dot with M = 240 → 2 M-tile passes: exactly
    half the MXU tile work of the grouped kernel, on a kernel that is
    MXU-bound at bulk batches (README "the fused-tail experiment").
    Row segments pad to the int32 sublane tile (8) so the kernel can
    split the product with aligned static slices; the xy block
    replicates per z (z-constant, +~1 MB weight traffic — noise next
    to the 254 MB cube read).
    """

    wc: jax.Array  # (Z, NG, r1+r2+r3, X·Yg) int8 — stacked xz|yz|xy
    dims: Tuple[int, int, int, int]  # (X, Y, Z, C)
    y_group: int
    #: quantization levels stacked on the class axis: 2 = the
    #: error-compensated hi/lo split (C2 = 2C, bit-parity with
    #: fast+int8), 1 = single-level q1-only templates (C2 = C — half
    #: the weight rows, so the default-arena stack is ONE 128-row MXU
    #: tile pass per step instead of two, half the weight streaming
    #: and half the resident m1/m2 accumulators; the price is the
    #: coarser template error s1/2 ≈ max|t|/254 per element instead
    #: of s2/2 ≈ max|t|/32k — see pipeline.fused_quant).
    levels: int = 2

    @property
    def row_segments(self) -> Tuple[int, int, int]:
        """(r1, r2, r3) padded row counts of the stacked blocks."""
        X, Y, Z, C = self.dims
        C2 = self.levels * C
        return (
            _round_up(C2 * self.y_group, _ACC),
            _round_up(C2 * X, _ACC),
            _round_up(C2, _ACC),
        )


def build_combined_weights(
    quant: Sequence[Optional[tuple]],
    dims: Tuple[int, int, int],
    y_group: Optional[int] = None,
    levels: int = 2,
) -> CombinedWeights:
    """Stacked single-dot weights (see CombinedWeights) from the
    quantized templates of build_onepass_weights. `levels` says how
    many quantization levels the quant tuples stack on the class axis
    (2 = hi/lo split templates, 1 = single-level — CombinedWeights
    docstring)."""
    X, Y, Z = dims
    w1, w2, w3, C2, Yg = _grouped_weight_arrays(quant, dims, y_group)
    if levels not in (1, 2) or C2 % levels:
        raise ValueError(
            f"levels {levels} does not divide the quant class axis {C2}"
        )
    Yp = _round_up(Y, _SUBLANE)
    NG = Yp // Yg
    r1 = _round_up(C2 * Yg, _ACC)
    r2 = _round_up(C2 * X, _ACC)
    r3 = _round_up(C2, _ACC)
    wc = np.zeros((Z, NG, r1 + r2 + r3, X * Yg), np.int8)
    wc[:, :, : C2 * Yg] = w1
    wc[:, :, r1 : r1 + C2 * X] = w2
    wc[:, :, r1 + r2 : r1 + r2 + C2] = np.broadcast_to(
        w3[None], (Z, NG, C2, X * Yg)
    )
    return CombinedWeights(
        wc=jnp.asarray(wc), dims=(X, Y, Z, C2 // levels), y_group=Yg,
        levels=levels,
    )


def _kernel_combined(r1, r2, cube_ref, wc_ref, o1_ref, o2_ref, o3_ref):
    """Single-dot variant of _kernel_grouped_tables (CombinedWeights).

    One (M, X·Yg) @ (X·Yg, B) s8×s8→s32 dot per (z, g) step; the
    product splits into the three table segments with static
    sublane-aligned row slices, each accumulating under its own
    schedule: m1 per y-group over z, m2 over the whole grid, m3 per
    z-row over the minor g steps — identical outputs to the grouped
    kernel at half the MXU tile passes.
    """
    _kernel_combined_zc(r1, r2, 1, cube_ref, wc_ref,
                        o1_ref, o2_ref, o3_ref)


def _kernel_combined_zc(r1, r2, zc, cube_ref, wc_ref,
                        o1_ref, o2_ref, o3_ref):
    """_kernel_combined generalized to `zc` z-slices per grid step.

    Same MACs and MXU tile passes as zc=1 — zc dots unrolled per step
    over static lane slices of one (X·Yg, zc·B) cube block — but 1/zc
    the grid steps and zc× the DMA granularity: the knob isolates
    whether the residual kernel cost is per-step overhead (bigger zc
    wins) or pure HBM/MXU (zc is neutral). Measured on the v5e the
    kernel IS step-bound: zc=4 at batch 2048 lifts tables-only from
    3.47M to 4.06M scans/s (+17%), zc=2 at batch 4096 to 4.18M (+20%);
    zc=4 at batch 4096 fails the Mosaic gate (the (X·Yg, zc·B) cube
    block outgrows VMEM double-buffering) — benchmarks/zc_probe.py.
    auto_z_chunk picks the measured winner from (Z, B).
    """
    B = o2_ref.shape[-1]
    z = pl.program_id(0)
    g = pl.program_id(1)
    blk = cube_ref[...]  # (X·Yg, zc·B) int8 — zc z-slices, all scans
    p1 = p2 = None
    for i in range(zc):
        p = jax.lax.dot_general(
            wc_ref[i, 0], blk[:, i * B:(i + 1) * B],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        p1 = p[:r1] if p1 is None else p1 + p[:r1]
        p2 = p[r1:r1 + r2] if p2 is None else p2 + p[r1:r1 + r2]
        p3 = p[r1 + r2:]

        @pl.when(g == 0)
        def _init3(i=i, p3=p3):
            o3_ref[i] = p3

        @pl.when(g != 0)
        def _acc3(i=i, p3=p3):
            o3_ref[i] += p3

    @pl.when(z == 0)
    def _init1():
        o1_ref[g] = p1

    @pl.when(z != 0)
    def _acc1():
        o1_ref[g] += p1

    first = jnp.logical_and(z == 0, g == 0)

    @pl.when(first)
    def _init2():
        o2_ref[...] = p2

    @pl.when(jnp.logical_not(first))
    def _acc2():
        o2_ref[...] += p2


def auto_z_chunk(
    Z: int, batch: int, lane_budget: int = 8192, zc_cap: int = 8
) -> int:
    """Measured-default z_chunk for the combined kernel.

    The kernel is step-bound on the v5e (benchmarks/zc_probe.py):
    zc=4 at batch 2048 lifts tables-only 3.49M→4.00M scans/s (+15%),
    zc=2 at batch 4096 3.89M→4.18M, zc=8 at batch 256 1.27M→1.65M
    (+30%). Returns the largest chunk ≤ `zc_cap` that divides Z
    inside the lane budget.

    Which numbers are architecture vs measurement:

    * "divides Z" — ARCHITECTURE: the grid is (Z/zc, NG); a
      non-dividing chunk has no kernel.
    * `lane_budget` 8192 — MEASUREMENT (one v5e + one Mosaic
      version): zc·batch is the lane count of the kernel's
      (X·Yg, zc·B) int8 cube block; 16384 lanes SIGABRTs (the
      double-buffered block plus outputs outgrow the ~16 MB VMEM),
      8192 passes everywhere tried. The budget is pinned by the CUBE
      BLOCK, not the accumulators: levels=1 weights (half the
      resident int32 accumulators) still abort at 16384 lanes at
      every batch tried (benchmarks/ZC_PROBE_C1.json). A different
      chip generation or Mosaic release may move this line.
    * `zc_cap` 8 — MEASUREMENT: zc=16 at batch 256 fits the budget
      but loses to zc=8 (DMA granularity stops paying).

    Both measured values are overridable per call, and every serving
    entry point (bench.py, apps/serve.py, apps/predict.py) validates
    the resulting program through utils/mosaic_gate at its exact
    batch/arena with a zc→zc/2→…→1 fallback ladder — a stale rule on
    new hardware degrades to a gated smaller chunk (worst case the
    zc=1 combined kernel, or the fast+int8 path), never a crash-loop.
    """
    zc = zc_cap
    while zc > 1:
        if Z % zc == 0 and zc * batch <= lane_budget:
            return zc
        zc //= 2
    return 1


def onepass_tables_combined_i8(
    cube_k: jax.Array,
    weights: CombinedWeights,
    interpret: bool = False,
    z_chunk: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One-pass raw tables via ONE stacked dot per step.

    Same contract as onepass_tables_i8 — returns (m1 (C2, Yp, B),
    m2 (C2, X, B), m3 (Z, C2, B)) int32, identical values — but takes
    CombinedWeights and runs one 2-M-tile dot per (z, g) step instead
    of three dots totalling 4 M-tile passes (see CombinedWeights).
    z_chunk > 1 unrolls that many z-slices per grid step (must divide
    Z; see _kernel_combined_zc for what the knob measures).
    """
    if not isinstance(weights, CombinedWeights):
        raise TypeError("onepass_tables_combined_i8 takes "
                        "CombinedWeights (build_combined_weights)")
    X, Y, Z, C = weights.dims
    C2 = weights.levels * C
    Yp = _round_up(Y, _SUBLANE)
    Yg = weights.y_group
    NG = Yp // Yg
    if Z % z_chunk:
        raise ValueError(f"z_chunk {z_chunk} does not divide Z={Z}")
    r1, r2, r3 = weights.row_segments
    o1, o2, o3 = _onepass_tables_combined_i8(
        cube_k, weights.wc, dims=weights.dims, y_group=Yg,
        rows=(r1, r2, r3), interpret=interpret, z_chunk=z_chunk,
    )
    B = o1.shape[-1]
    m1 = (
        o1[:, : C2 * Yg]
        .reshape(NG, C2, Yg, B)
        .transpose(1, 0, 2, 3)
        .reshape(C2, Yp, B)
    )
    return m1, o2[: C2 * X].reshape(C2, X, B), o3[:, :C2]


@functools.partial(
    jax.jit,
    static_argnames=("dims", "y_group", "rows", "interpret", "z_chunk"),
)
def _onepass_tables_combined_i8(
    cube_k: jax.Array,
    wc: jax.Array,
    dims: Tuple[int, int, int, int],
    y_group: int,
    rows: Tuple[int, int, int],
    interpret: bool = False,
    z_chunk: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    X, Y, Z, C = dims
    Yp = _round_up(Y, _SUBLANE)
    Yg = y_group
    NG = Yp // Yg
    r1, r2, r3 = rows
    XYp, ZB = cube_k.shape
    if XYp != X * Yp or ZB % Z:
        raise ValueError(f"packed cube shape {cube_k.shape} does not "
                         f"match arena dims {(X, Y, Z)}")
    B = ZB // Z
    M = r1 + r2 + r3
    zc = z_chunk
    return pl.pallas_call(
        functools.partial(_kernel_combined_zc, r1, r2, zc),
        grid=(Z // zc, NG),
        in_specs=[
            pl.BlockSpec(
                (X * Yg, zc * B), lambda z, g: (g, z),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (zc, 1, M, X * Yg), lambda z, g: (z, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((NG, r1, B), lambda z, g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r2, B), lambda z, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((zc, r3, B), lambda z, g: (z, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NG, r1, B), jnp.int32),
            jax.ShapeDtypeStruct((r2, B), jnp.int32),
            jax.ShapeDtypeStruct((Z, r3, B), jnp.int32),
        ],
        interpret=interpret,
    )(cube_k, wc)


def _kernel_scores(
    C2, Tp, NG, Yg, X,
    cube_ref, w1_ref, w2_ref, w3_ref, kidx_ref, rows1_ref, rows2_ref,
    o1_ref, o2_ref, o3_ref, acc1, acc2,
):
    """Full in-kernel scoring over a (Z, NG) grid.

    m1/m2 accumulate in VMEM scratch (m1 per y-group via a dynamic
    leading index; m2 across the whole grid); the z rows select
    per-step against program_id exactly like _kernel_sel. At the last
    step each target's (y, x) rows are read out of the accumulators
    with full-row masked sums against precomputed row indices (rows1
    encodes group+class+offset, rows2 class+x; -1 selects nothing).
    The kernel's only HBM outputs are three (C2·Tp, B) score blocks —
    the XLA tail is dequantize + calibrate on (B, T, C) scalars.
    """
    z = pl.program_id(0)
    g = pl.program_id(1)
    nz = pl.num_programs(0)
    blk = cube_ref[...]  # (X·Yg, B) int8 — this (z, group), all scans
    dn = (((1,), (0,)), ((), ()))

    def dot(w):
        return jax.lax.dot_general(
            w, blk, dn, preferred_element_type=jnp.int32
        )

    p1 = dot(w1_ref[0, 0])
    p2 = dot(w2_ref[0, 0])
    p3c = dot(w3_ref[0])  # (C2, B)
    m = (kidx_ref[...] == z).astype(jnp.int32)  # (Tp, B)
    p3 = (p3c[:, None, :] * m[None, :, :]).reshape(C2 * Tp, p3c.shape[-1])

    @pl.when(z == 0)
    def _init1():
        acc1[g] = p1

    @pl.when(z != 0)
    def _acc1():
        acc1[g] += p1

    first = jnp.logical_and(z == 0, g == 0)

    @pl.when(first)
    def _init23():
        acc2[...] = p2
        o3_ref[...] = p3

    @pl.when(jnp.logical_not(first))
    def _acc23():
        acc2[...] += p2
        o3_ref[...] += p3

    @pl.when(jnp.logical_and(z == nz - 1, g == NG - 1))
    def _select():
        B = p1.shape[-1]
        a1 = acc1[...].reshape(NG * C2 * Yg, B)
        a2 = acc2[...]
        i1 = jax.lax.broadcasted_iota(jnp.int32, (NG * C2 * Yg, B), 0)
        i2 = jax.lax.broadcasted_iota(jnp.int32, (C2 * X, B), 0)
        for r in range(C2 * Tp):
            m1 = (i1 == rows1_ref[r:r + 1, :]).astype(jnp.int32)
            o1_ref[r:r + 1, :] = jnp.sum(a1 * m1, axis=0, keepdims=True)
            m2 = (i2 == rows2_ref[r:r + 1, :]).astype(jnp.int32)
            o2_ref[r:r + 1, :] = jnp.sum(a2 * m2, axis=0, keepdims=True)


def onepass_scores_i8(
    cube_k: jax.Array,
    weights: GroupedWeights,
    ijk: jax.Array,
    valid: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One-read int8 scoring with ALL table lookups folded in-kernel.

    cube_k must be packed with the SAME y_group as the weights
    (pack_cubes_i8(cubes, y_group=weights.y_group)). ijk: (B, T, 3)
    int32 per-target (i=x, j=y, k=z) cell indices; valid: optional
    (B, T) bool — invalid slots select nothing and return zero rows.

    Returns (s1, s2, s3), each (C2, Tp, B) int32: the per-target
    table reads M1[c,j], M2[c,i], M3[k,c] already selected. Slice
    [:, :T, :B] and dequantize with the plane scales exactly like the
    (m1, m2, m3) lookups of onepass_tables_i8 — the XLA tail left is
    scales + intercept + calibration on (B, T, C) scalars. Replaces
    the per-target table-read loop of /root/reference/predict.py:103-119.
    """
    if not isinstance(weights, GroupedWeights):
        raise TypeError("onepass_scores_i8 takes GroupedWeights "
                        "(build_grouped_weights)")
    idx = ijk.astype(jnp.int32)
    if valid is not None:
        idx = jnp.where(valid[..., None], idx, -1)
    return _onepass_scores_i8(
        cube_k, weights.w1, weights.w2, weights.w3, idx,
        dims=weights.dims, y_group=weights.y_group, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("dims", "y_group", "interpret")
)
def _onepass_scores_i8(
    cube_k: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    w3: jax.Array,
    ijk: jax.Array,
    dims: Tuple[int, int, int, int],
    y_group: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    X, Y, Z, C = dims
    C2 = 2 * C
    Yp = _round_up(Y, _SUBLANE)
    Yg = y_group
    NG = Yp // Yg
    XYp, ZB = cube_k.shape
    if XYp != X * Yp or ZB % Z:
        raise ValueError(f"packed cube shape {cube_k.shape} does not "
                         f"match arena dims {(X, Y, Z)}")
    B = ZB // Z
    T = ijk.shape[1]
    Tp = _round_up(T, SEL_TP)
    idx = jnp.pad(
        jnp.transpose(ijk, (1, 2, 0)),  # (T, 3, Bin)
        ((0, Tp - T), (0, 0), (0, B - ijk.shape[0])),
        constant_values=-1,
    )  # (Tp, 3, B)
    ii, jj, kk = idx[:, 0, :], idx[:, 1, :], idx[:, 2, :]
    c2r = jnp.arange(C2, dtype=jnp.int32)[:, None, None]
    rows1 = jnp.where(
        jj[None] < 0, -1,
        (jj[None] // Yg) * (C2 * Yg) + c2r * Yg + jj[None] % Yg,
    ).reshape(C2 * Tp, B)
    rows2 = jnp.where(ii[None] < 0, -1, c2r * X + ii[None]).reshape(
        C2 * Tp, B
    )
    s1, s2, s3 = pl.pallas_call(
        functools.partial(_kernel_scores, C2, Tp, NG, Yg, X),
        grid=(Z, NG),
        in_specs=[
            pl.BlockSpec(
                (X * Yg, B), lambda z, g: (g, z), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, C2 * Yg, X * Yg), lambda z, g: (z, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, C2 * X, X * Yg), lambda z, g: (z, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, C2, X * Yg), lambda z, g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((Tp, B), lambda z, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2 * Tp, B), lambda z, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2 * Tp, B), lambda z, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C2 * Tp, B), lambda z, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2 * Tp, B), lambda z, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2 * Tp, B), lambda z, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C2 * Tp, B), jnp.int32),
            jax.ShapeDtypeStruct((C2 * Tp, B), jnp.int32),
            jax.ShapeDtypeStruct((C2 * Tp, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NG, C2 * Yg, B), jnp.int32),
            pltpu.VMEM((C2 * X, B), jnp.int32),
        ],
        interpret=interpret,
    )(cube_k, w1, w2, w3, kk, rows1, rows2)
    return (
        s1.reshape(C2, Tp, B),
        s2.reshape(C2, Tp, B),
        s3.reshape(C2, Tp, B),
    )
