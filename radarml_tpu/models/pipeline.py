"""The real-time predict pipeline as a single jitted device program.

Re-design of the reference's predict loop (predict.py:72-131): per
scan, slice the three 2-D projections at each target's cube indices,
zoom them into the training arena, build the feature vector, score the
calibrated linear model, and threshold. The reference runs this
per-target in Python at ~8-10 ms/target on a Pi; here the whole batch
of scans × targets executes as one XLA program — slices are dynamic
gathers, zooms are MXU matmuls, scoring is one matmul — so per-chip
throughput is bounded by HBM streaming of the scan cubes.

Dynamic target counts become a static `max_targets` axis with a
validity mask (SURVEY.md §7 hard part 5): invalid rows still flow
through the math on clamped indices and are masked at the end, which is
the XLA-friendly alternative to data-dependent control flow.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radarml_tpu.core.arena import Arena, ProjMask, RADAR_MAX
from radarml_tpu.ops.features import predict_zoom
from radarml_tpu.ops.resample import spline_zoom_pair
from radarml_tpu.models.linear import (
    LinearModel,
    SigmoidCalibration,
    calibrated_from_decision,
    predict_proba_calibrated,
    predict_proba_log_loss,
    proba_from_decision,
)

UNKNOWN = -1  # prediction index when below min_proba (the "Unknown" label)


def _dev_cast(x, dtype):
    """`jnp.asarray(x, dtype)` that is a true no-op when `x` is already
    a device array of that dtype.

    On the tunneled axon backend an explicit-dtype `jnp.asarray`
    enqueues a device dispatch (~0.5 ms/call) even when the dtype
    already matches — it HALVED the fused hot path until guarded
    (benchmarks/tail_probe.py: kernel+tail 3.0M scans/s, shipped
    __call__ 1.4M; the entire gap was this per-call conversion).
    """
    if isinstance(x, jax.Array) and x.dtype == dtype:
        return x
    return jnp.asarray(x, dtype)


def encode_int8_cubes(cubes):
    """Encode raw 0..255 scan cubes as the int8 wire format (value-128).

    Lossless for integer-valued radar data; uint8 input converts with a
    zero-copy xor-msb reinterpret on host. Already-int8 input passes
    through (a native driver can emit the shifted form directly).
    """
    if isinstance(cubes, np.ndarray):
        if cubes.dtype == np.int8:
            return jnp.asarray(cubes)
        if cubes.dtype == np.uint8:
            return jnp.asarray((cubes ^ np.uint8(0x80)).view(np.int8))
        return jnp.asarray(
            (np.asarray(cubes, np.int16) - 128).astype(np.int8)
        )
    if not isinstance(cubes, jax.Array):
        cubes = jnp.asarray(cubes)
    if cubes.dtype == jnp.int8:
        return cubes  # no asarray dispatch: see _dev_cast
    return (cubes.astype(jnp.int16) - 128).astype(jnp.int8)


def encode_host_cubes(cubes: np.ndarray, cube_dtype: str) -> np.ndarray:
    """Narrow a canonical 0..255 host cube to a stream dtype on host.

    Shared by RadarPredictor.encode_host and ServingArtifact.encode_host
    so serving layers move 1 B/voxel (2 for bf16) from ingest onward.
    int8 output carries the value-128 wire encoding (encode_int8_cubes);
    non-integer input truncates exactly like the device-side cast.
    """
    cubes = np.asarray(cubes)
    if cube_dtype == "uint8":
        return cubes if cubes.dtype == np.uint8 else cubes.astype(np.uint8)
    if cube_dtype == "int8":
        if cubes.dtype == np.int8:
            return cubes
        u8 = cubes if cubes.dtype == np.uint8 else cubes.astype(np.uint8)
        return (u8 ^ np.uint8(0x80)).view(np.int8)
    if cube_dtype == "bfloat16":
        import ml_dtypes

        return cubes.astype(ml_dtypes.bfloat16)
    return cubes if cubes.dtype == np.float32 else cubes.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class NeuralClassifier:
    """Serving wrapper for the neural families (CNN / SGAN classifier).

    The reference can only serve its sklearn SVM pickle
    (predict.py:224-227); here every trained family plugs into the same
    RadarPredictor: targets slice out of the cube, each projection
    bicubic-resizes to `rescale` and scales to [-1, 1] exactly as
    training preprocessing did (dnn.py:202-245 semantics,
    data/preprocess.py), and `apply` maps the (N, h, w, 3) view stack
    to (N, n_classes) logits in inference mode.
    """

    apply: Callable
    rescale: Tuple[int, int]
    n_classes: int


@dataclasses.dataclass(frozen=True)
class RadarPredictor:
    """Batched scan→detections predictor.

    Args mirror the reference CLI (predict.py:133-157): a training
    arena (fixes feature geometry), a scan arena (may differ → zoom),
    projection mask, calibrated linear model, and the min_proba
    threshold below which a target is 'Unknown'.
    """

    train_arena: Arena
    scan_arena: Arena
    model: LinearModel
    calibration: Optional[SigmoidCalibration] = None
    proj_mask: ProjMask = ProjMask(True, True, True)
    min_proba: float = 0.7
    # "exact" | "fast" | "fused" | "pallas" (linear-only fast paths).
    # "fused" is the fastest bulk path: the one-HBM-pass int8 Pallas
    # kernel (ops/pallas_i8_score) over pack_host-packed scan batches,
    # bit-identical decisions to fast+int8.
    mode: str = "exact"
    # fused-mode lookup tail (benchmarks/onepass_probe.py):
    #   "lookup"  — kernel emits the raw m1/m2/m3 tables; XLA reads
    #               them with lane-wise masked sums.
    #   "glookup" — same XLA tail, but the kernel runs y-grouped dots
    #               (~29% fewer MACs; the kernel is MXU-bound at bulk
    #               batches — ops/pallas_i8_score._kernel_grouped_tables).
    #   "combo"   — glookup's grid with the three per-step dots stacked
    #               into ONE (the M-tile passes halve: the C2-row xy
    #               dot wasted 95% of a 128-row MXU pass —
    #               ops/pallas_i8_score.CombinedWeights).
    #   "sel"     — the z-table (the largest, (Z, C2, B)) never leaves
    #               the kernel: per-target z rows are selected against
    #               program_id each grid step.
    #   "sel3"    — ALL three lookups fold in-kernel (m1/m2 accumulate
    #               in VMEM scratch, one-hot row selection at the last
    #               z-step); the XLA tail is dequant+calibrate only.
    # All five are decision-identical; the default follows the
    # fastest measured variant on a v5e, re-confirmed at every
    # operating point benched so far: at batch 2048 "combo" won the
    # interleaved 7-round medians outside every rival's range
    # (3.35M scans/s vs glookup/lookup/sel3 ≤3.14M — BENCH r04), and
    # at the measured-best batch 4096 it leads by ~20-23% across two
    # independent reruns (4.08M/3.97M medians vs glookup 3.30M/3.31M
    # > lookup 2.96M/3.07M > sel 2.89M/2.91M; sel3's 4096 program is
    # Mosaic-rejected — round-5 reruns, artifact of record
    # BENCH_r05.json). Its halved MXU M-tile count is the one tail
    # delta the hardware separates from drift at every batch.
    fused_tail: str = "combo"
    # combo-tail z_chunk override. None = auto_z_chunk(Z, batch) at
    # trace time (the v5e-measured rule). The mosaic gate's fallback
    # ladder passes an explicit smaller chunk here when the auto rule
    # is stale for the current chip/Mosaic (ops auto_z_chunk docstring
    # says which numbers are measurement vs architecture).
    fused_z_chunk: Optional[int] = None
    # Template quantization of the fused path (combo tail only):
    #   "split"  — the error-compensated hi/lo int8 pair (default;
    #              C2 = 2C rows, decisions BIT-IDENTICAL to
    #              mode="fast"+int8, template error ≤ max|t|/32k per
    #              element — _quantized_split_templates).
    #   "single" — q1-only templates (C2 = C): the stacked combo dot
    #              drops from 240 to 128 rows at the default arena —
    #              ONE MXU M-tile pass per grid step instead of two —
    #              with half the weight streaming and half the
    #              resident m1/m2 accumulators. The price: template
    #              error grows to ≤ max|t|/254 per element (~1e-3
    #              relative on decisions vs the split mode's ~1e-5),
    #              so decisions are NO LONGER guaranteed bit-identical
    #              to fast+int8 — tests measure argmax agreement and
    #              the proba delta on synthetic data
    #              (tests/test_pallas_i8.py
    #              test_fused_quant_single_decisions). Opt-in; never a
    #              default. bench.py times it as "fused_c1" but
    #              excludes it from the headline, which only a
    #              bit-parity mode may take.
    fused_quant: str = "split"
    mesh: object = None  # optional jax Mesh: shard scans over 'data'
    # Device dtype of the scan-cube stream. Radar cubes are 8-bit
    # sensor data (reference predict.py:90-91 GetRawImage yields
    # 0..255), and every such value is exactly representable in
    # bfloat16, uint8 AND (shifted by -128) int8 — so all three narrow
    # dtypes are lossless on real scans.
    # "bfloat16" halves HBM/host-link traffic vs f32; "uint8" quarters
    # the host-link bytes with the f32 cast fused into a VPU reduction
    # (which goes compute-bound at ~165 GB/s, benchmarks/
    # contraction_probe.py); "int8" carries value-128 on the wire and
    # scores with error-compensated int8 templates as s8xs8->s32 MXU
    # dots — the fastest measured stream (~1.75x uint8; the -128 shift
    # folds into the intercept, so it is as lossless as uint8).
    # uint8/int8 truncate: only use them for integer-valued 0..255
    # cubes. Keep "float32" for arbitrary continuous inputs.
    cube_dtype: str = "float32"  # "float32"|"bfloat16"|"uint8"|"int8"

    def __post_init__(self):
        if self.mode == "pallas" and self.cube_dtype in ("uint8", "int8"):
            # The bf16 table kernel predates the one-read int8 kernel;
            # for 8-bit streams use mode="fused" (ops/pallas_i8_score).
            raise ValueError("pallas mode supports float32/bfloat16 "
                             "streams; use mode='fused' for int8")
        is_linear = type(self.model).__name__ == "LinearModel"
        if self.mode == "fused":
            if not is_linear:
                raise ValueError("fused mode folds linear models only")
            if self.fused_tail not in (
                "lookup", "glookup", "combo", "sel", "sel3"
            ):
                raise ValueError(
                    "fused_tail must be 'lookup', 'glookup', 'combo', "
                    "'sel' or 'sel3'"
                )
            if self.fused_quant not in ("split", "single"):
                raise ValueError(
                    "fused_quant must be 'split' or 'single'"
                )
            if self.fused_quant == "single" and self.fused_tail != "combo":
                raise ValueError(
                    "fused_quant='single' applies to fused_tail='combo' "
                    "only (the measured-winner kernel the mode exists "
                    "to push further)"
                )
            if self.fused_z_chunk is not None:
                zc = int(self.fused_z_chunk)
                if self.fused_tail != "combo":
                    raise ValueError(
                        "fused_z_chunk applies to fused_tail='combo' only"
                    )
                if zc < 1 or self.scan_arena.size_z % zc:
                    raise ValueError(
                        f"fused_z_chunk {zc} must be >= 1 and divide "
                        f"size_z={self.scan_arena.size_z}"
                    )
            # The kernel's wire format IS int8 (value-128, packed
            # scan-minor); every requested stream dtype resolves to it
            # (all four are lossless for 8-bit radar cubes, so a
            # bfloat16/uint8 request loses nothing).
            object.__setattr__(self, "cube_dtype", "int8")
            object.__setattr__(self, "_fn", self._build_fused())
        elif type(self.model).__name__ == "NeuralClassifier":
            object.__setattr__(self, "_fn", self._build_neural())
        elif self.mode == "pallas" and is_linear:
            object.__setattr__(self, "_fn", self._build_pallas())
        elif self.mode == "fast" and is_linear:
            object.__setattr__(self, "_fn", self._build_folded())
        else:
            object.__setattr__(self, "_fn", self._build())

    def _folded_templates(self):
        """Fold zoom matrices + /255 scale + linear weights into
        per-class templates at the scan's NATIVE plane resolution.

        The per-target pipeline slice→zoom→flatten→concat→scale→score
        is linear in the raw planes, so for each plane p with zoom
        operators R_p, C_p and weight block W_c^p (reshaped to the
        zoomed plane), decision contributions collapse to
        ⟨R_pᵀ W_c^p C_p, X_p⟩ / RADAR_MAX. One (C, F_native) template
        matrix replaces all resampling matmuls — the per-target cost
        becomes a single matvec on the raw slices.
        """
        scan = self.scan_arena
        zoom = predict_zoom(self.train_arena, scan)
        coef = np.asarray(self.model.coef, np.float64)
        C = coef.shape[0]
        parts = []
        off = 0
        for shape, z, keep in zip(
            (scan.xz_shape, scan.yz_shape, scan.xy_shape), zoom, self.proj_mask
        ):
            if not keep:
                continue
            r, c, (o_h, o_w) = spline_zoom_pair(tuple(shape), tuple(z))
            W = coef[:, off : off + o_h * o_w].reshape(C, o_h, o_w)
            A = np.einsum("oh,cop,pw->chw", r, W, c) / RADAR_MAX
            parts.append(A.reshape(C, -1))
            off += o_h * o_w
        templates = np.concatenate(parts, axis=1).astype(np.float32)
        return templates  # (C, F_native)

    def _split_templates(self):
        """Folded templates reshaped to per-plane (C, ·, ·) tensors
        (None where the plane is masked out)."""
        scan = self.scan_arena
        templates = self._folded_templates()
        C = templates.shape[0]
        shapes = [scan.xz_shape, scan.yz_shape, scan.xy_shape]
        out = []
        off = 0
        for shape, keep in zip(shapes, self.proj_mask):
            if not keep:
                out.append(None)
                continue
            size = shape[0] * shape[1]
            out.append(
                jnp.asarray(templates[:, off : off + size].reshape((C,) + shape))
            )
            off += size
        return out

    def _quantized_split_templates(self, levels: int = 2):
        """Per-plane error-compensated int8 templates + scales.

        For each plane template t (C, H, W): a coarse per-class int8
        quantization q1 = rint(t/s1) with s1 = max|t_c|/127, and a
        second int8 pass q2 over the residual r = t - s1*q1 with
        s2 = max|r_c|/127 — so ⟨t, x⟩ ≈ s1⟨q1, x⟩ + s2⟨q2, x⟩ with
        per-element error ≤ s2/2 ≈ max|t|/32k (empirically ~1e-5
        relative on decisions; the bf16x2 trick of ops/pallas_score
        applied to int arithmetic). q1 and q2 CONCATENATE on the class
        axis: one (2C, H, W) operand means one s8xs8->s32 MXU dot and
        ONE cube read per plane — the compensation is free, because
        this contraction is HBM-bound, not MXU-bound
        (benchmarks/contraction_probe.py).

        Also returns const_c = 128*Σt: int8 cubes carry value-128, and
        ⟨t, u⟩ = ⟨t, u-128⟩ + 128Σt folds the shift into a per-class
        constant.

        `levels=1` (fused_quant="single") skips the residual pass and
        returns (q1 (C, H, W), s1, None, const) — half the weight rows
        with per-element error ≤ s1/2 ≈ max|t|/254 (the fused_quant
        field comment has the trade).
        """
        outs = []
        for t in self._split_templates():
            if t is None:
                outs.append(None)
                continue
            t = np.asarray(t, np.float64)
            a1 = np.abs(t).max(axis=(1, 2))
            s1 = np.where(a1 > 0, a1 / 127.0, 1.0)
            q1 = np.rint(t / s1[:, None, None])
            const = jnp.asarray(128.0 * t.sum(axis=(1, 2)), jnp.float32)
            if levels == 1:
                outs.append(
                    (
                        jnp.asarray(q1.astype(np.int8)),
                        jnp.asarray(s1, jnp.float32),
                        None,
                        const,
                    )
                )
                continue
            r = t - q1 * s1[:, None, None]
            a2 = np.abs(r).max(axis=(1, 2))
            s2 = np.where(a2 > 0, a2 / 127.0, 1.0)
            q2 = np.rint(r / s2[:, None, None])
            outs.append(
                (
                    jnp.asarray(np.concatenate([q1, q2]).astype(np.int8)),
                    jnp.asarray(s1, jnp.float32),
                    jnp.asarray(s2, jnp.float32),
                    const,
                )
            )
        return outs

    def _build_folded(self) -> Callable:
        """Template-contraction scoring: per-target cost is 3 lookups.

        The decision's xz contribution for a target at plane index j is
        ⟨A_xz_c, cube[:, j, :]⟩ — so contracting the WHOLE cube with
        the template once, M1[c, y] = Σ_xz A_xz[c, x, z]·cube[x, y, z],
        turns every target's contribution into the table read M1[c, j]
        (similarly M2[c, i] for yz and M3[c, k] for xy). Three einsums
        per scan replace all per-target slicing/matvecs; the number of
        targets becomes free.

        With cube_dtype="int8" the einsums run as s8xs8->s32 MXU dots
        against quantized templates (see _quantized_split_templates):
        ~1.75x the uint8 VPU path on a v5e, at the HBM roofline for
        this 3-contraction formulation.
        """
        scan = self.scan_arena
        int8 = self.cube_dtype == "int8"
        if int8:
            quant = self._quantized_split_templates()
        else:
            quant = None
        t_xz, t_yz, t_xy = self._split_templates()
        intercept = self.model.intercept
        calib = self.calibration
        min_proba = self.min_proba
        p = jax.lax.Precision.HIGHEST  # bandwidth-bound; precision is free

        idx_fn = jax.vmap(
            jax.vmap(
                lambda xyz: jnp.stack(
                    scan.clamped_matrix_indices(xyz[0], xyz[1], xyz[2])
                )
            )
        )

        def table(plane_i, t, cubes, spec):
            """One plane's (B, C, ·) lookup table."""
            if not int8:
                return jnp.einsum(spec, t, cubes, precision=p)
            q, s1, s2, const = quant[plane_i]
            raw = jnp.einsum(
                spec, q, cubes, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            C = s1.shape[0]
            return (
                raw[:, :C] * s1[None, :, None]
                + raw[:, C:] * s2[None, :, None]
                + const[None, :, None]
            )

        @jax.jit
        def predict_batch(cubes, target_xyz, target_valid):
            B, T = target_xyz.shape[:2]
            if not int8:
                # bf16/u8-ingested cubes widen here; XLA fuses the cast
                # into the reduction loops, so the stream is read once
                # at the narrow width (the win measured in bench.py).
                cubes = cubes.astype(jnp.float32)
            ijk = idx_fn(target_xyz)  # (B, T, 3) int32
            dec = jnp.broadcast_to(
                intercept[None, None, :], (B, T, intercept.shape[0])
            )
            # Table reads as one-hot contractions rather than
            # take_along_axis gathers: the (B,C,·)x(B,T,·) batched
            # matmul keeps the lookup on the matrix units, worth ~12%
            # of the whole int8 pipeline on a v5e
            # (benchmarks/contraction_probe.py full_i8_onehot vs
            # full_i8_gather) — same trick ops/pallas_score.py uses
            # where Mosaic forbids dynamic indexing on tiled dims.
            if t_xz is not None:
                M1 = table(0, t_xz, cubes, "cxz,bxyz->bcy")
                o = jax.nn.one_hot(
                    ijk[..., 1], M1.shape[2], dtype=jnp.float32
                )
                dec = dec + jnp.einsum("bcy,bty->btc", M1, o, precision=p)
            if t_yz is not None:
                M2 = table(1, t_yz, cubes, "cyz,bxyz->bcx")
                o = jax.nn.one_hot(
                    ijk[..., 0], M2.shape[2], dtype=jnp.float32
                )
                dec = dec + jnp.einsum("bcx,btx->btc", M2, o, precision=p)
            if t_xy is not None:
                M3 = table(2, t_xy, cubes, "cxy,bxyz->bcz")
                o = jax.nn.one_hot(
                    ijk[..., 2], M3.shape[2], dtype=jnp.float32
                )
                dec = dec + jnp.einsum("bcz,btz->btc", M3, o, precision=p)
            dec = dec.reshape(B * T, -1)
            if calib is not None:
                proba = calibrated_from_decision(dec, calib)
            else:
                proba = proba_from_decision(dec)
            proba = proba.reshape(B, T, -1)
            best = jnp.argmax(proba, axis=-1).astype(jnp.int32)
            best_p = jnp.max(proba, axis=-1)
            pred = jnp.where(best_p >= min_proba, best, UNKNOWN)
            pred = jnp.where(target_valid, pred, UNKNOWN)
            return pred, best_p, proba

        return predict_batch

    def _build_pallas(self) -> Callable:
        """Folded templates + the fused Pallas scan→scores kernel.

        Streams each cube through VMEM exactly once (ops/pallas_score);
        requires all three projections (the kernel contracts all
        planes) and a TPU backend — pass interpret-mode only in tests.
        """
        if not all(self.proj_mask):
            raise ValueError("pallas mode requires the full ProjMask")
        from radarml_tpu.ops.pallas_score import fused_native_score

        scan = self.scan_arena
        templates = self._folded_templates()
        C = templates.shape[0]
        n_xz = scan.size_x * scan.size_z
        n_yz = scan.size_y * scan.size_z
        t_xz = jnp.asarray(
            templates[:, :n_xz].reshape(C, scan.size_x, scan.size_z)
        )
        t_yz = jnp.asarray(
            templates[:, n_xz : n_xz + n_yz].reshape(
                C, scan.size_y, scan.size_z
            )
        )
        t_xy = jnp.asarray(
            templates[:, n_xz + n_yz :].reshape(C, scan.size_x, scan.size_y)
        )
        intercept = self.model.intercept
        calib = self.calibration
        min_proba = self.min_proba
        interpret = jax.default_backend() != "tpu"

        idx_fn = jax.vmap(
            jax.vmap(
                lambda xyz: jnp.stack(
                    scan.clamped_matrix_indices(xyz[0], xyz[1], xyz[2])
                )
            )
        )

        @jax.jit
        def predict_batch(cubes, target_xyz, target_valid):
            B, T = target_xyz.shape[:2]
            ijk = idx_fn(target_xyz).astype(jnp.int32)
            dec = fused_native_score(
                cubes, ijk, t_xz, t_yz, t_xy, intercept, interpret=interpret
            ).reshape(B * T, C)
            if calib is not None:
                proba = calibrated_from_decision(dec, calib)
            else:
                proba = proba_from_decision(dec)
            proba = proba.reshape(B, T, -1)
            best = jnp.argmax(proba, axis=-1).astype(jnp.int32)
            best_p = jnp.max(proba, axis=-1)
            pred = jnp.where(best_p >= min_proba, best, UNKNOWN)
            pred = jnp.where(target_valid, pred, UNKNOWN)
            return pred, best_p, proba

        return predict_batch

    def _build_fused(self) -> Callable:
        """One-HBM-pass int8 kernel + raw-table lookup tail.

        The fastest measured bulk path on a v5e (~1.6-2.1x the 3-read
        fast int8 formulation in one process, benchmarks/
        onepass_probe.py): ops/pallas_i8_score streams each packed
        cube through VMEM exactly ONCE and computes all three
        contraction tables as big-K s8xs8->s32 MXU matmuls with scans
        riding the lane dimension. Lookups read the RAW int32 tables
        through lane-wise masked-sum reductions (scans are the minor
        dim, so per-scan dynamic reads fuse into one streaming pass
        over each table — no transposes, no B-batched tiny matmuls),
        and the quantization scales apply to the (B, T, 2C) lookup
        results. Decisions are bit-identical to mode="fast" with
        cube_dtype="int8" (same quantized templates, both paths exact
        integer arithmetic). Replaces /root/reference/predict.py:72-131.

        fused_tail picks where the table lookups run (see the field
        comment): "lookup" reads kernel-emitted raw tables in XLA;
        "sel"/"sel3" fold the z / all lookups into the kernel itself,
        shrinking or eliminating the table HBM round-trip. Identical
        decisions and probabilities on every slot (selection uses the
        same clamped indices).
        """
        from radarml_tpu.ops.pallas_i8_score import (
            auto_z_chunk,
            build_combined_weights,
            build_grouped_weights,
            build_onepass_weights,
            onepass_scores_i8,
            onepass_tables_combined_i8,
            onepass_tables_i8,
            onepass_tables_grouped_i8,
            onepass_tables_sel_i8,
        )

        tail = self.fused_tail
        zc_override = (
            int(self.fused_z_chunk) if self.fused_z_chunk else None
        )
        scan = self.scan_arena
        levels = 1 if self.fused_quant == "single" else 2
        quant = self._quantized_split_templates(levels=levels)
        dims = (scan.size_x, scan.size_y, scan.size_z)
        if tail == "combo":
            # y-grouped grid + ONE stacked dot per step (half the MXU
            # tile passes of glookup; ops CombinedWeights docstring).
            # levels=1 (fused_quant="single") halves the stack again —
            # one M-tile pass per step at the default arena.
            weights = build_combined_weights(
                quant, dims, y_group=self._pack_y_group, levels=levels
            )
        elif tail in ("sel3", "glookup"):
            # y-grouped GRID: ~30% fewer MACs (the kernel is MXU-bound
            # at bulk batches; ops module docstring). All tails share
            # the grouped WIRE layout (self._pack_y_group), so one
            # packed batch serves any.
            weights = build_grouped_weights(
                quant, dims, y_group=self._pack_y_group
            )
        else:
            weights = build_onepass_weights(
                quant, dims, y_group=self._pack_y_group
            )
        scales = [
            (q[1], q[2], q[3]) if q is not None else None for q in quant
        ]
        intercept = self.model.intercept
        C = intercept.shape[0]
        calib = self.calibration
        min_proba = self.min_proba
        interpret = jax.default_backend() != "tpu"

        idx_fn = jax.vmap(
            jax.vmap(
                lambda xyz: jnp.stack(
                    scan.clamped_matrix_indices(xyz[0], xyz[1], xyz[2])
                )
            )
        )

        def dequant_cd(m_c2db, sc):
            """(C2, D, B) int32 raw table → (C, D, B) f32 dequantized.

            Dequantizing BEFORE the lookup halves the masked-sum read
            traffic (C rows instead of C2 = 2C) at the cost of one
            cheap streaming pass over the table. Bit-identical to
            dequantizing the looked-up values: the lookup selects a
            single element, and s1*select(m) == select(s1*m) in f32.
            Single-level quant (s2 None) has C2 = C: one scale term.
            """
            s1, s2, const = sc
            hi = m_c2db[:C].astype(jnp.float32) * s1[:, None, None]
            if s2 is None:
                return hi
            return hi + m_c2db[C:].astype(jnp.float32) * s2[:, None, None]

        def lookup_cd(m_cdb, idx):
            """(C, D, B) dequantized table, (B, T) indices → (B, T, C)."""
            D = m_cdb.shape[1]
            eq = (
                jax.lax.broadcasted_iota(jnp.int32, (1, D, 1, 1), 1)
                == idx.T[None, None, :, :]
            )  # (1, D, T, B)
            r = jnp.sum(m_cdb[:, :, None, :] * eq, axis=1)  # (C, T, B)
            return r.transpose(2, 1, 0)

        def dequant_dc(m_dc2b, sc):
            """(D, C2, B) int32 raw table (kernel-native m3 order) →
            (D, C, B) f32 dequantized. Single-level quant (s2 None)
            has C2 = C: one scale term."""
            s1, s2, _ = sc
            hi = m_dc2b[:, :C].astype(jnp.float32) * s1[None, :, None]
            if s2 is None:
                return hi
            return hi + m_dc2b[:, C:].astype(jnp.float32) * s2[None, :, None]

        def lookup_dc(m_dcb, idx):
            """(D, C, B) dequantized table, (B, T) indices → (B, T, C)."""
            D = m_dcb.shape[0]
            eq = (
                jax.lax.broadcasted_iota(jnp.int32, (D, 1, 1, 1), 0)
                == idx.T[None, None, :, :]
            )  # (D, 1, T, B)
            r = jnp.sum(m_dcb[:, :, None, :] * eq, axis=0)  # (C, T, B)
            return r.transpose(2, 1, 0)

        def selected(s, T):
            """Kernel-selected (C2, Tp, B) block → (B, T, C2) f32."""
            return s[:, :T, :].transpose(2, 1, 0).astype(jnp.float32)

        def combine(r, sc):
            s1, s2, const = sc
            return r[..., :C] * s1 + r[..., C:] * s2 + const

        @jax.jit
        def predict_packed(cube_k, target_xyz, target_valid):
            B, T = target_xyz.shape[:2]
            ijk = idx_fn(target_xyz).astype(jnp.int32)
            dec = jnp.broadcast_to(intercept[None, None, :], (B, T, C))
            if tail == "sel3":
                s1, s2, s3 = onepass_scores_i8(
                    cube_k, weights, ijk, interpret=interpret
                )
                for r, sc in zip(
                    (selected(s, T) for s in (s1, s2, s3)), scales
                ):
                    if sc is not None:
                        dec = dec + combine(r, sc)
            else:
                if tail == "sel":
                    m1, m2, d3 = onepass_tables_sel_i8(
                        cube_k, weights, ijk[..., 2], interpret=interpret
                    )
                    if scales[2] is not None:
                        dec = dec + combine(selected(d3, T), scales[2])
                else:
                    if tail == "combo":
                        # Batch is static at trace time, so the
                        # measured step-bound z_chunk bakes into the
                        # compiled program (auto_z_chunk docstring);
                        # fused_z_chunk pins it (gate fallback ladder).
                        m1, m2, m3 = onepass_tables_combined_i8(
                            cube_k, weights, interpret=interpret,
                            z_chunk=zc_override
                            or auto_z_chunk(scan.size_z, B),
                        )
                    elif tail == "glookup":
                        m1, m2, m3 = onepass_tables_grouped_i8(
                            cube_k, weights, interpret=interpret
                        )
                    else:
                        m1, m2, m3 = onepass_tables_i8(
                            cube_k, weights, interpret=interpret
                        )
                    if scales[2] is not None:
                        dec = dec + lookup_dc(
                            dequant_dc(m3, scales[2]), ijk[..., 2]
                        ) + scales[2][2]
                # Dequant-then-lookup (see dequant_cd): half the
                # masked-sum reads, bit-identical decisions.
                if scales[0] is not None:
                    dec = dec + lookup_cd(
                        dequant_cd(m1, scales[0]), ijk[..., 1]
                    ) + scales[0][2]
                if scales[1] is not None:
                    dec = dec + lookup_cd(
                        dequant_cd(m2, scales[1]), ijk[..., 0]
                    ) + scales[1][2]
            dec = dec.reshape(B * T, C)
            if calib is not None:
                proba = calibrated_from_decision(dec, calib)
            else:
                proba = proba_from_decision(dec)
            proba = proba.reshape(B, T, -1)
            best = jnp.argmax(proba, axis=-1).astype(jnp.int32)
            best_p = jnp.max(proba, axis=-1)
            pred = jnp.where(best_p >= min_proba, best, UNKNOWN)
            pred = jnp.where(target_valid, pred, UNKNOWN)
            return pred, best_p, proba

        return predict_packed

    def _build(self) -> Callable:
        train, scan = self.train_arena, self.scan_arena
        zoom = predict_zoom(train, scan)
        mats = []
        for shape, z, keep in zip(
            (scan.xz_shape, scan.yz_shape, scan.xy_shape), zoom, self.proj_mask
        ):
            if not keep:
                mats.append(None)
                continue
            r, c, _ = spline_zoom_pair(tuple(shape), tuple(z))
            mats.append(
                (
                    jnp.asarray(r, dtype=jnp.float32),
                    jnp.asarray(c, dtype=jnp.float32),
                )
            )

        model, calib = self.model, self.calibration
        min_proba = self.min_proba
        is_svc = type(model).__name__ == "SVCModel"
        if is_svc:
            from radarml_tpu.models import svc as _svc
        p = jax.lax.Precision.HIGHEST
        # int8 wire format carries value-128; decode restores 0..255.
        shift = 128.0 if self.cube_dtype == "int8" else 0.0

        def per_target(cube, xyz):
            cube = cube.astype(jnp.float32) + shift
            i, j, k = scan.clamped_matrix_indices(xyz[0], xyz[1], xyz[2])
            yz = jax.lax.dynamic_index_in_dim(cube, i, axis=0, keepdims=False)
            xz = jax.lax.dynamic_index_in_dim(cube, j, axis=1, keepdims=False)
            xy = jax.lax.dynamic_index_in_dim(cube, k, axis=2, keepdims=False)
            parts = []
            for plane, mat in zip((xz, yz, xy), mats):
                if mat is None:
                    continue
                out = jnp.einsum("oh,hw->ow", mat[0], plane, precision=p)
                out = jnp.einsum("ow,pw->op", out, mat[1], precision=p)
                parts.append(out.reshape(-1))
            return jnp.concatenate(parts) / RADAR_MAX

        # vmap over targets within a scan, then over scans.
        feat_fn = jax.vmap(jax.vmap(per_target, in_axes=(None, 0)), in_axes=(0, 0))

        @jax.jit
        def predict_batch(cubes, target_xyz, target_valid):
            B, T = target_xyz.shape[:2]
            feats = feat_fn(cubes, target_xyz).reshape(B * T, -1)
            if is_svc:
                proba = _svc.predict_proba(model, feats)
            elif calib is not None:
                proba = predict_proba_calibrated(model, calib, feats)
            else:
                proba = predict_proba_log_loss(model, feats)
            proba = proba.reshape(B, T, -1)
            best = jnp.argmax(proba, axis=-1).astype(jnp.int32)
            best_p = jnp.max(proba, axis=-1)
            pred = jnp.where(best_p >= min_proba, best, UNKNOWN)
            pred = jnp.where(target_valid, pred, UNKNOWN)
            return pred, best_p, proba

        return predict_batch

    def _build_neural(self) -> Callable:
        """Serving path for NeuralClassifier models (CNN / SGAN c-head).

        Per target: slice the three projections, reproduce the training
        preprocessing exactly — scale [0, RADAR_MAX] → [-1, 1]
        (dnn.py:202-204), PIL-parity bicubic resize to the model's
        rescale (dnn.py:240-245 / data/preprocess.resize_views) — then
        run the network in inference mode and softmax the logits.
        """
        from radarml_tpu.ops.resample import bicubic_pair

        scan = self.scan_arena
        model: NeuralClassifier = self.model
        min_proba = self.min_proba
        half = RADAR_MAX / 2.0
        p = jax.lax.Precision.HIGHEST
        # int8 wire format carries value-128; decode restores 0..255.
        shift = 128.0 if self.cube_dtype == "int8" else 0.0
        mats = []
        for shape in (scan.xz_shape, scan.yz_shape, scan.xy_shape):
            r, c = bicubic_pair(tuple(shape), tuple(model.rescale))
            mats.append(
                (jnp.asarray(r, jnp.float32), jnp.asarray(c, jnp.float32))
            )

        def per_target(cube, xyz):
            cube = cube.astype(jnp.float32) + shift
            i, j, k = scan.clamped_matrix_indices(xyz[0], xyz[1], xyz[2])
            yz = jax.lax.dynamic_index_in_dim(cube, i, axis=0, keepdims=False)
            xz = jax.lax.dynamic_index_in_dim(cube, j, axis=1, keepdims=False)
            xy = jax.lax.dynamic_index_in_dim(cube, k, axis=2, keepdims=False)
            views = []
            for plane, (r, c) in zip((xz, yz, xy), mats):
                sym = (plane - half) / half
                out = jnp.einsum("oh,hw->ow", r, sym, precision=p)
                out = jnp.einsum("ow,pw->op", out, c, precision=p)
                views.append(out)
            return jnp.stack(views, axis=-1)  # (h, w, 3) in XZ,YZ,XY order

        feat_fn = jax.vmap(
            jax.vmap(per_target, in_axes=(None, 0)), in_axes=(0, 0)
        )

        @jax.jit
        def predict_batch(cubes, target_xyz, target_valid):
            B, T = target_xyz.shape[:2]
            views = feat_fn(cubes, target_xyz)
            views = views.reshape((B * T,) + tuple(model.rescale) + (3,))
            logits = model.apply(views)
            proba = jax.nn.softmax(logits, axis=-1).reshape(B, T, -1)
            best = jnp.argmax(proba, axis=-1).astype(jnp.int32)
            best_p = jnp.max(proba, axis=-1)
            pred = jnp.where(best_p >= min_proba, best, UNKNOWN)
            pred = jnp.where(target_valid, pred, UNKNOWN)
            return pred, best_p, proba

        return predict_batch

    def encode_host(self, cubes: np.ndarray) -> np.ndarray:
        """Narrow a canonical 0..255 host cube to the stream dtype.

        Serving loops call this at INGEST so every later stage —
        host-side stacking/batching, the process-internal memcpy, and
        the host→device transfer — moves 1 B/voxel (2 for bf16)
        instead of 4. __call__ accepts the result directly: uint8/int8
        arrays pass through its device encode untouched. Lossless for
        integer-valued radar data (reference predict.py:90-91);
        non-integer values truncate exactly like the device-side cast.
        """
        return encode_host_cubes(cubes, self.cube_dtype)

    def pack_host(self, cubes: np.ndarray) -> np.ndarray:
        """Pack (B, X, Y, Z) cubes into the fused kernel's wire layout.

        Host-side (X·Yp, Z·Bp) int8 packing (value-128, scan-minor,
        scans padded to the lane tile) — see ops/pallas_i8_score.
        Bulk paths call this once per batch; __call__ accepts the
        result directly and also 4-D cubes (packed on device at the
        cost of one extra stream pass). The row order is the y-grouped
        layout keyed only on the scan arena (tail-independent, see
        _pack_y_group) — one packed batch serves every fused_tail.
        """
        from radarml_tpu.ops.pallas_i8_score import pack_cubes_i8

        return pack_cubes_i8(cubes, y_group=self._pack_y_group)

    @property
    def _pack_y_group(self) -> Optional[int]:
        """y_group of the fused wire layout.

        Tail-INDEPENDENT: every fused tail packs (and builds weights
        for) the same y-grouped row order, keyed only on the arena —
        so a batch packed by one predictor scores identically under
        any fused_tail, and a layout mismatch between tails is
        impossible. (sel3 additionally runs its grid per group;
        lookup/sel just consume the permuted K axis.)
        """
        if self.mode == "fused":
            from radarml_tpu.ops.pallas_i8_score import best_y_group

            return best_y_group(
                self.scan_arena.size_x, self.scan_arena.size_y
            )
        return None

    def __call__(
        self,
        cubes: jax.Array,
        target_xyz: jax.Array,
        target_valid: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Classify targets in a batch of scans.

        Args:
            cubes: (B, size_x, size_y, size_z) raw scan cubes.
            target_xyz: (B, T, 3) target positions in cm (padded).
            target_valid: (B, T) bool mask of real targets.

        Returns:
            (pred, best_proba, proba): (B, T) int32 class index or
            UNKNOWN; (B, T) best probability; (B, T, C) full matrix.
        """
        if self.mode == "fused":
            return self._call_fused(cubes, target_xyz, target_valid)
        if self.cube_dtype == "int8":
            if not (
                isinstance(cubes, jax.Array) and cubes.dtype == jnp.int8
            ):
                cubes = encode_int8_cubes(cubes)
        else:
            cubes = _dev_cast(cubes, jnp.dtype(self.cube_dtype))
        target_xyz = _dev_cast(target_xyz, jnp.float32)
        if target_valid is None:
            target_valid = jnp.ones(target_xyz.shape[:2], dtype=bool)
        if self.mesh is not None:
            from radarml_tpu.parallel.mesh import shard_batch

            cubes, target_xyz, target_valid = shard_batch(
                self.mesh, cubes, target_xyz, target_valid
            )
        return self._fn(cubes, target_xyz, target_valid)

    def _call_fused(self, cubes, target_xyz, target_valid):
        """fused-mode dispatch: packed 2-D input or on-device packing.

        A 2-D array is the pack_host wire layout (scans already padded
        to the lane tile); 4-D cubes are encoded + packed on device
        (one extra stream pass — bulk callers should pack_host).
        Targets pad to the packed scan count; outputs slice back.
        """
        from radarml_tpu.ops.pallas_i8_score import pack_cubes_i8_device

        Z = self.scan_arena.size_z
        if self.mesh is not None:
            return self._call_fused_mesh(cubes, target_xyz, target_valid)
        if getattr(cubes, "ndim", None) == 4:
            cube_k = pack_cubes_i8_device(
                encode_int8_cubes(cubes), y_group=self._pack_y_group
            )
        else:
            cube_k = cubes if (
                isinstance(cubes, jax.Array) and cubes.dtype == jnp.int8
            ) else jnp.asarray(cubes)
            if cube_k.dtype != jnp.int8 or cube_k.shape[1] % Z:
                raise ValueError(
                    "fused mode takes (B, X, Y, Z) cubes or the "
                    "pack_host (X*Yp, Z*Bp) int8 layout"
                )
        Bp = cube_k.shape[1] // Z
        target_xyz = _dev_cast(target_xyz, jnp.float32)
        B, T = target_xyz.shape[:2]
        if target_valid is None:
            target_valid = jnp.ones((B, T), dtype=bool)
        if B != Bp:
            target_xyz = jnp.pad(target_xyz, ((0, Bp - B), (0, 0), (0, 0)))
            target_valid = jnp.pad(target_valid, ((0, Bp - B), (0, 0)))
        pred, best_p, proba = self._fn(cube_k, target_xyz, target_valid)
        if B != Bp:
            pred, best_p, proba = pred[:B], best_p[:B], proba[:B]
        return pred, best_p, proba

    def _call_fused_mesh(self, cubes, target_xyz, target_valid):
        """Mesh-sharded fused serving: shard_map over the 'data' axis.

        Scans are embarrassingly parallel, so each chip packs and
        scores its own shard with the one-read kernel — no
        collectives; throughput scales with mesh size. Takes 4-D
        cubes only (the packed wire layout interleaves scans with z,
        so it cannot be split on the batch axis; pack happens
        per-shard on device instead).
        """
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from radarml_tpu.ops.pallas_i8_score import pack_cubes_i8_device
        from radarml_tpu.parallel.mesh import shard_batch

        if getattr(cubes, "ndim", None) != 4:
            raise ValueError(
                "fused mesh serving takes (B, X, Y, Z) cubes (the "
                "packed layout interleaves scans with z and cannot be "
                "batch-sharded; packing happens per shard)"
            )
        n = int(np.prod(self.mesh.devices.shape))
        B = cubes.shape[0]
        if B % n:
            raise ValueError(
                f"fused mesh serving needs the scan batch ({B}) "
                f"divisible by the mesh size ({n})"
            )
        cubes = encode_int8_cubes(cubes)
        target_xyz = _dev_cast(target_xyz, jnp.float32)
        T = target_xyz.shape[1]
        if target_valid is None:
            target_valid = jnp.ones((B, T), dtype=bool)
        cubes, target_xyz, target_valid = shard_batch(
            self.mesh, cubes, target_xyz, target_valid
        )
        fn = self._fn
        yg = self._pack_y_group
        Z = self.scan_arena.size_z

        @jax.jit
        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=P("data"),
            # pallas_call outputs carry no varying-mesh-axis info
            check_vma=False,
        )
        def run(lc, lx, lv):
            ck = pack_cubes_i8_device(lc, y_group=yg)
            Bl = lc.shape[0]
            Bp = ck.shape[1] // Z
            if Bl != Bp:  # pack pads scans to the lane tile
                lx = jnp.pad(lx, ((0, Bp - Bl), (0, 0), (0, 0)))
                lv = jnp.pad(lv, ((0, Bp - Bl), (0, 0)))
            pred, best_p, proba = fn(ck, lx, lv)
            return pred[:Bl], best_p[:Bl], proba[:Bl]

        return run(cubes, target_xyz, target_valid)


def pad_targets(
    target_lists, max_targets: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack per-scan variable-length target lists into padded arrays.

    Host-side glue between a driver's target reports and the static
    shapes the jitted predictor requires.
    """
    B = len(target_lists)
    xyz = np.zeros((B, max_targets, 3), dtype=np.float32)
    valid = np.zeros((B, max_targets), dtype=bool)
    for b, targets in enumerate(target_lists):
        for t, tgt in enumerate(targets[:max_targets]):
            xyz[b, t] = (tgt[0], tgt[1], tgt[2])
            valid[b, t] = True
    return xyz, valid
