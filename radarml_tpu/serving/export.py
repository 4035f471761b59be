"""AOT serving artifacts: ship the compiled predictor, not the code.

The reference deploys by unpickling an sklearn estimator into the same
Python code that trained it (reference predict.py:224-227). For
production TPU serving we additionally support exporting the ENTIRE
jitted predict program — slicing, zoom, feature build, calibrated
scoring, thresholding — as one portable `jax.export` artifact:

* the batch dimension is symbolic, so one artifact serves any batch
  size with no per-shape retrace;
* reloading needs no model weights, no pipeline construction, and no
  radarml_tpu model code — the weights are constants folded into the
  program (a serving host needs only jax + this loader);
* the StableHLO payload is versioned and platform-checked by jax.export
  itself, and round-trips bit-identically (tests/test_export.py).

`apps.serve --export_serving/--serving_artifact` wire this into the
streaming service.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import pickle
from typing import Callable, Optional, Sequence, Tuple

logger = logging.getLogger(__name__)

FORMAT_V1 = "radarml_tpu.serving_export.v1"  # legacy pickle container
FORMAT = "radarml_tpu.serving_export.v2"
# v2 container: MAGIC, one JSON metadata line, then the raw serialized
# StableHLO blob. No unpickler runs on load, so a ModelReloader
# watching the path cannot be turned into code execution by whoever
# can write it (the blob itself is versioned/platform-checked by
# jax.export on deserialize).
MAGIC = b"RMLTPU-SERVING\n"


def export_predictor(
    predictor,
    path: str,
    max_targets: int = 4,
    platforms: Optional[Sequence[str]] = None,
    batch: Optional[int] = None,
) -> dict:
    """Export a RadarPredictor's jitted program to `path`.

    Args:
        predictor: a models.pipeline.RadarPredictor (any mode/dtype).
        path: output file.
        max_targets: static target-slot axis baked into the program
            (the batch axis stays symbolic).
        platforms: lowering platforms, e.g. ("tpu", "cpu"). Defaults to
            the current backend only.
        batch: static scan-batch size — REQUIRED for mode="fused"
            (scans pad to the kernel's 128-lane tile inside the wire
            layout, which shape polymorphism cannot express); the
            exported program takes 4-D cubes and packs on device.
            Other modes keep the symbolic batch axis and ignore this.

    Returns the artifact metadata dict.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    grid = predictor.scan_arena.grid_shape
    cube_dtype = jnp.dtype(predictor.cube_dtype)
    if predictor.mode == "fused":
        if batch is None:
            raise ValueError(
                "mode='fused' exports need a static batch= (the packed "
                "wire layout pads scans to the 128-lane tile)"
            )
        from radarml_tpu.ops.pallas_i8_score import pack_cubes_i8_device

        inner = predictor._fn
        yg = predictor._pack_y_group
        Z = int(grid[2])

        @jax.jit
        def fn(cubes, xyz, valid):
            ck = pack_cubes_i8_device(cubes, y_group=yg)
            B, Bp = cubes.shape[0], ck.shape[1] // Z
            if B != Bp:
                xyz = jnp.pad(xyz, ((0, Bp - B), (0, 0), (0, 0)))
                valid = jnp.pad(valid, ((0, Bp - B), (0, 0)))
            pred, best_p, proba = inner(ck, xyz, valid)
            return pred[:B], best_p[:B], proba[:B]

        b = batch
    else:
        fn = predictor._fn
        (b,) = jexport.symbolic_shape("b")
    args = (
        jax.ShapeDtypeStruct((b,) + tuple(grid), cube_dtype),
        jax.ShapeDtypeStruct((b, max_targets, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, max_targets), jnp.bool_),
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jexport.export(fn, **kwargs)(*args)
    meta = {
        "format": FORMAT,
        "mode": predictor.mode,
        "cube_dtype": str(predictor.cube_dtype),
        "min_proba": float(predictor.min_proba),
        "max_targets": int(max_targets),
        "grid_shape": tuple(int(g) for g in grid),
        "platforms": list(exported.platforms),
        **({"batch": int(batch)} if predictor.mode == "fused" else {}),
    }
    # Atomic replace: a ModelReloader watching `path` (train
    # --online_learn or a re-export rewrites it live) must never read
    # a half-written artifact.
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as fp:
        fp.write(MAGIC)
        fp.write(json.dumps(meta).encode("utf-8"))
        fp.write(b"\n")
        fp.write(exported.serialize())
    os.replace(tmp, path)
    logger.info(
        "exported serving program to %s (%s, batch symbolic, T=%d)",
        path, meta["platforms"], max_targets,
    )
    return meta


@dataclasses.dataclass(frozen=True)
class ServingArtifact:
    """Loaded AOT predictor: call like a RadarPredictor."""

    call: Callable
    mode: str
    cube_dtype: str
    min_proba: float
    max_targets: int
    grid_shape: Tuple[int, ...]
    platforms: Tuple[str, ...]
    # static scan batch for fused-mode artifacts; None = symbolic
    batch: Optional[int] = None

    def encode_host(self, cubes):
        """Narrow a canonical 0..255 host cube to the artifact's baked
        stream dtype (see models/pipeline.encode_host_cubes)."""
        from radarml_tpu.models.pipeline import encode_host_cubes

        return encode_host_cubes(cubes, self.cube_dtype)

    def __call__(self, cubes, xyz, valid):
        import jax.numpy as jnp

        b = cubes.shape[0]
        if self.batch is not None and b > self.batch:
            raise ValueError(
                f"this fused artifact was exported for a static batch "
                f"of {self.batch} scans, got {b} — score in chunks of "
                f"{self.batch} (the serve CLI's --max_batch does this)"
            )
        from radarml_tpu.models.pipeline import _dev_cast

        if self.cube_dtype == "int8":
            # The baked program expects the value-128 wire encoding;
            # a straight cast of canonical 0..255 would overflow int8.
            import jax

            if not (
                isinstance(cubes, jax.Array) and cubes.dtype == jnp.int8
            ):
                from radarml_tpu.models.pipeline import encode_int8_cubes

                cubes = encode_int8_cubes(cubes)
        else:
            cubes = _dev_cast(cubes, jnp.dtype(self.cube_dtype))
        xyz = _dev_cast(xyz, jnp.float32)
        valid = _dev_cast(valid, jnp.bool_)
        if self.batch is not None and b < self.batch:
            # Smaller batches (the unary gRPC path runs (1, T)) pad up
            # to the baked shape; pad slots carry valid=False targets
            # and the outputs slice back, so results are unaffected.
            pad = self.batch - b
            cubes = jnp.pad(cubes, ((0, pad),) + ((0, 0),) * (cubes.ndim - 1))
            xyz = jnp.pad(xyz, ((0, pad), (0, 0), (0, 0)))
            valid = jnp.pad(valid, ((0, pad), (0, 0)))
            out = self.call(cubes, xyz, valid)
            return tuple(o[:b] for o in out)
        return self.call(cubes, xyz, valid)


def load_serving_artifact(
    path: str, allow_v1_pickle: bool = False
) -> ServingArtifact:
    """Load an exported predictor; no model code or weights needed.

    v2 artifacts (the current format) are a JSON metadata line plus the
    raw serialized StableHLO blob — loading never runs an unpickler, so
    a `ModelReloader` watching the path is safe against artifact-file
    writers injecting code. Legacy v1 artifacts are pickles; loading
    one runs the unpickler (arbitrary code execution for whoever wrote
    the file), so it requires an explicit `allow_v1_pickle=True` from
    a caller who trusts the path — the reference's own trust model (an
    sklearn pickle, predict.py:224-227). Re-export to v2 to drop the
    requirement.
    """
    from jax import export as jexport

    with open(path, "rb") as fp:
        raw = fp.read()
    if raw.startswith(MAGIC):
        head, _, blob = raw[len(MAGIC):].partition(b"\n")
        payload = json.loads(head.decode("utf-8"))
        if payload.get("format") != FORMAT:
            raise ValueError(f"not a serving export artifact: {path}")
        payload["blob"] = blob
    else:
        if not allow_v1_pickle:
            raise ValueError(
                f"{path} is not a v2 serving artifact; if it is a "
                "legacy v1 pickle from a TRUSTED source, pass "
                "allow_v1_pickle=True (v1 loading executes the "
                "unpickler) or re-export it to v2"
            )
        payload = pickle.loads(raw)
        if payload.get("format") != FORMAT_V1:
            raise ValueError(f"not a serving export artifact: {path}")
    exported = jexport.deserialize(payload["blob"])
    return ServingArtifact(
        call=exported.call,
        mode=payload["mode"],
        cube_dtype=payload["cube_dtype"],
        min_proba=payload["min_proba"],
        max_targets=payload["max_targets"],
        grid_shape=tuple(payload["grid_shape"]),
        platforms=tuple(payload["platforms"]),
        batch=payload.get("batch"),
    )
