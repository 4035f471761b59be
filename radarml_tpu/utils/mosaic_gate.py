"""Crash-isolation gate for fused-mode Pallas kernels.

Mosaic (the TPU Pallas compiler) rejects some programs with a hard
C++ ``abort()`` — a SIGABRT that no Python ``try/except`` can catch —
rather than a catchable exception (observed in this repo for e.g.
reductions over both tiled dims at once; see ops/pallas_score.py).
``bench.py`` must print its one JSON line even if a fused variant
aborts, so before timing the fused tails in-process it asks this
module which ones actually compile AND execute on the current backend:
each candidate runs in a CHILD process, where an abort costs only
that child.

The gate probes the SAME program the caller will run: pass the
caller's ``batch`` (the packed wire layout rides the lane dimension,
so the Mosaic program differs per padded batch) and ``arena`` (the
kernel grid/tiling is keyed on the scan arena's grid shape). With the
persistent compile cache on, a passing gate even pre-warms the
caller's own compile. Non-TPU backends run the fused kernels in
interpret mode (pure XLA — nothing to gate), so everything passes
there without child processes.

Child protocol (``python -m radarml_tpu.utils.mosaic_gate t1 t2 …``):
probe each tail in order; print ``ok <tail>`` (flushed) after each
success and ``fail <tail> …`` to stderr for catchable errors. A crash
mid-list tells the parent exactly which tail died — the first one with
neither verdict — and the parent re-spawns for the remainder, so one
abort never shadows an untested tail.
"""

from __future__ import annotations

import subprocess
import sys
from typing import Iterable, List, Optional, Tuple

#: "tables" probes the raw onepass_tables_i8 kernel (no scoring tail).
GATE_TAILS = ("lookup", "sel", "sel3")


def gate_fused_variants(
    tails: Iterable[str] = GATE_TAILS,
    batch: int = 256,
    timeout: float = 900.0,
    log=None,
    arena: str = "",
) -> List[str]:
    """Return the subset of `tails` that survive compile+execute.

    `batch` and `arena` (a --scan_arena CSV spec, '' = training arena)
    select the exact kernel program to vouch for. On non-TPU backends
    every tail passes without spawning anything (interpret mode, no
    Mosaic). On TPU, tails are probed in child processes; a tail whose
    child dies (signal, abort, nonzero exit) is dropped. If a child
    HANGS past `timeout` (tunnel outage, not a kernel problem), the
    tails probed so far are returned and the rest are dropped — the
    caller keeps its one-JSON-line contract either way.
    """
    import jax

    tails = list(tails)
    if jax.default_backend() != "tpu":
        return tails

    def note(msg: str) -> None:
        if log is not None:
            log(msg)

    passed: List[str] = []
    remaining = tails
    while remaining:
        cmd = [
            sys.executable,
            "-m",
            "radarml_tpu.utils.mosaic_gate",
            "--batch",
            str(batch),
        ]
        if arena:
            cmd += ["--arena", arena]
        cmd += remaining
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=timeout
            )
        except subprocess.TimeoutExpired as e:
            ok, _ = _parse_verdicts(_as_text(e.stdout), _as_text(e.stderr))
            passed.extend(t for t in remaining if t in ok)
            note(f"mosaic gate timed out; keeping {passed}")
            return passed
        ok, failed = _parse_verdicts(proc.stdout, proc.stderr)
        passed.extend(t for t in remaining if t in ok)
        for t in remaining:
            if t in failed:
                note(f"mosaic gate: {t} failed in-child: {failed[t]}")
        survivors = [
            t for t in remaining if t not in ok and t not in failed
        ]
        if proc.returncode == 0:
            for t in survivors:  # unknown tail names etc.
                note(f"mosaic gate: {t} not probed by the child")
            return passed
        # Child died (Mosaic abort / signal) on the first survivor —
        # tails with a catchable 'fail' verdict were already past.
        if survivors:
            dead, remaining = survivors[0], survivors[1:]
            tail_err = (proc.stderr or "").strip().splitlines()
            note(
                f"mosaic gate: {dead} crashed the child "
                f"(exit {proc.returncode}"
                + (f"; last stderr: {tail_err[-1][:200]}" if tail_err else "")
                + "); skipping it"
            )
        else:  # crashed after the last verdict (e.g. at interpreter exit)
            return passed
    return passed


def _as_text(out) -> str:
    if out is None:
        return ""
    if isinstance(out, bytes):
        return out.decode(errors="replace")
    return out


def _parse_verdicts(stdout: str, stderr: str) -> Tuple[set, dict]:
    """(ok tails, {failed tail: reason}) from the child's streams."""
    ok = set()
    for line in (stdout or "").splitlines():
        if line.startswith("ok "):
            ok.add(line[3:].strip())
    failed = {}
    for line in (stderr or "").splitlines():
        if line.startswith("fail "):
            rest = line[5:].strip()
            tail, _, reason = rest.partition(" ")
            failed[tail] = reason[:200]
    return ok, failed


def _parse_ok(stdout: str) -> set:
    """Back-compat helper: ok tails only."""
    return _parse_verdicts(stdout, "")[0]


def _child_main(argv: List[str]) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--arena", type=str, default="",
                    help="--scan_arena CSV spec ('' = training arena)")
    ap.add_argument("tails", nargs="+")
    args = ap.parse_args(argv)

    import os

    import jax

    # The env var alone does not always pick the backend when a
    # site-level PJRT plugin pre-registered one (CLAUDE.md) — pin it.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/radarml_jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import numpy as np

    from radarml_tpu.apps.common_cli import parse_arena
    from radarml_tpu.core.arena import DEFAULT_ARENA
    from radarml_tpu.data.labels import LabelEncoder
    from radarml_tpu.data.synthetic import make_dataset
    from radarml_tpu.models.linear import (
        SGDConfig,
        calibrate_ovr,
        sgd_fit,
        sgd_model,
    )
    from radarml_tpu.models.pipeline import RadarPredictor, pad_targets

    scan_arena = parse_arena(args.arena)

    samples, labels = make_dataset(30, seed=11)
    le, y = LabelEncoder.fit_transform(labels)
    from radarml_tpu.ops.features import process_samples

    X = process_samples(samples, scale=True).astype(np.float32)
    cfg = SGDConfig(alpha=1e-5)
    state = sgd_fit(
        X[:24], y[:24], n_classes=len(le.classes_), cfg=cfg, epochs=2
    )
    model = sgd_model(state, cfg)
    calib = calibrate_ovr(model, X[24:], y[24:])
    kw = dict(
        train_arena=DEFAULT_ARENA,
        scan_arena=scan_arena,
        model=model,
        calibration=calib,
        min_proba=0.7,
    )

    # Scan cubes on the SCAN arena's grid (the kernel is keyed on it).
    rng = np.random.default_rng(7)
    cubes_np = rng.integers(
        0, 256, size=(args.batch,) + scan_arena.grid_shape, dtype=np.uint8
    )
    xyz_np, valid_np = pad_targets(
        [[(5.0, 5.0, 100.0)]] * args.batch, max_targets=4
    )

    packed = None
    for tail in args.tails:
        try:
            if tail == "tables":
                from radarml_tpu.ops.pallas_i8_score import (
                    build_onepass_weights,
                    onepass_tables_i8,
                )

                p = RadarPredictor(mode="fused", **kw)
                quant = p._quantized_split_templates()
                w = build_onepass_weights(
                    quant,
                    (
                        scan_arena.size_x,
                        scan_arena.size_y,
                        scan_arena.size_z,
                    ),
                    y_group=p._pack_y_group,
                )
                if packed is None:
                    packed = jax.device_put(p.pack_host(cubes_np))
                interp = jax.default_backend() != "tpu"
                out = jax.jit(
                    lambda ck: onepass_tables_i8(ck, w, interpret=interp)
                )(packed)
                _ = jax.device_get(out[0][:1, :1])
            else:
                p = RadarPredictor(mode="fused", fused_tail=tail, **kw)
                if packed is None:
                    packed = jax.device_put(p.pack_host(cubes_np))
                pred, _, _ = p(packed, xyz_np, valid_np)
                _ = jax.device_get(pred[:1])
        except Exception as e:  # catchable failure — report, keep probing
            print(
                f"fail {tail} {type(e).__name__}: {str(e)[:200]}",
                file=sys.stderr,
                flush=True,
            )
            continue
        print(f"ok {tail}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(_child_main(sys.argv[1:]))
