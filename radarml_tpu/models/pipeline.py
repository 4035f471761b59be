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
    predict_proba_calibrated,
    predict_proba_log_loss,
)

UNKNOWN = -1  # prediction index when below min_proba (the "Unknown" label)


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

    def __post_init__(self):
        object.__setattr__(self, "_fn", self._build())

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

        def per_target(cube, xyz):
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
        cubes = jnp.asarray(cubes, dtype=jnp.float32)
        target_xyz = jnp.asarray(target_xyz, dtype=jnp.float32)
        if target_valid is None:
            target_valid = jnp.ones(target_xyz.shape[:2], dtype=bool)
        return self._fn(cubes, target_xyz, target_valid)


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
