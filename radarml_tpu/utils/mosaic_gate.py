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
abort never shadows an untested tail. ``--batch`` takes a
comma-separated list; a tail's ``ok`` means it passed at EVERY batch
(the Mosaic program differs per padded batch, so a multi-bucket
service gates each distinct program in one child).

Tail specs: a bare tail name probes the predictor's defaults; the
``combo@<zc>`` form pins the combined kernel's z_chunk, and
``combo1`` probes the combo tail with single-level templates
(``fused_quant="single"`` — pipeline field comment). When a bare
``combo``/``combo1`` crashes the child, the parent walks a
zc→zc/2→…→1 fallback ladder (re-probing ``combo@<smaller>``) before
giving up — so a chip
or Mosaic where the v5e-measured auto_z_chunk rule is stale degrades
to a gated smaller chunk instead of losing the combo tail outright
(ops/pallas_i8_score.auto_z_chunk documents which of its numbers are
measurement vs architecture). The passing spec is returned verbatim;
callers map it with ``split_tail_spec``.
"""

from __future__ import annotations

import subprocess
import sys
from typing import Iterable, List, Optional, Sequence, Tuple, Union

#: "tables" probes the raw onepass_tables_i8 kernel (no scoring tail).
GATE_TAILS = ("lookup", "sel", "sel3")


def split_tail_spec(spec: str) -> Tuple[str, Optional[int]]:
    """'combo@4' → ('combo', 4); 'lookup' → ('lookup', None)."""
    base, sep, zc = spec.partition("@")
    return (base, int(zc)) if sep else (base, None)


def tail_spec(tail: str, fused_quant: str = "split") -> str:
    """Gate spec name for a predictor's (fused_tail, fused_quant) —
    the single-level combo stack (fused_quant="single") is a DIFFERENT
    Mosaic program (half the stacked rows), so it gates under its own
    'combo1' name. The single source of this mapping: every caller
    that gates a fused predictor (bench.py, apps/predict.py,
    apps/serve.py, _child_main here) goes through this pair so the
    gate can never vouch for a different program than the one served.
    """
    return "combo1" if (tail, fused_quant) == ("combo", "single") else tail


def spec_predictor_kwargs(spec: str) -> dict:
    """RadarPredictor kwargs selecting the exact fused program a gate
    spec names — the inverse of tail_spec (+ the pinned z_chunk, if
    the spec carries one from the fallback ladder)."""
    base, zc = split_tail_spec(spec)
    kw = {
        "fused_tail": "combo" if base == "combo1" else base,
        "fused_quant": "single" if base == "combo1" else "split",
    }
    if zc is not None:
        kw["fused_z_chunk"] = zc
    return kw


def resolve_tail(
    passed: Iterable[str], tail: str
) -> Tuple[bool, Optional[int]]:
    """(did `tail` pass, its pinned z_chunk if any) from a
    gate_fused_variants result — the ladder may have passed a tail
    under a 'combo@<zc>' spec rather than its bare name."""
    for spec in passed:
        base, zc = split_tail_spec(spec)
        if base == tail:
            return True, zc
    return False, None


def _zc_ladder_next(
    spec: str, batches: Sequence[int], arena: str = ""
) -> Optional[str]:
    """Next fallback rung after a rejected combo spec, or None.

    A bare 'combo' rejection means auto_z_chunk's measured rule picked
    a chunk Mosaic rejects at (one of) the caller's batches; retry at
    half the SMALLEST auto chunk across the batches — a ladder rung
    pins one zc for every batch, and only the largest batch's auto
    chunk (the min: auto shrinks as B grows) keeps zc·B inside the
    lane budget at every batch; starting from the max would spend
    30-90 s child probes on programs the budget already forbids at
    the big batches. Halve further (skipping non-divisors of Z) down
    to zc=1, the single-slice kernel — if that is rejected too the
    tail is genuinely out.
    """
    base, zc = split_tail_spec(spec)
    if base not in ("combo", "combo1"):
        return None
    from radarml_tpu.apps.common_cli import parse_arena
    from radarml_tpu.ops.pallas_i8_score import auto_z_chunk

    Z = parse_arena(arena).size_z
    if zc is None:
        chunks = [auto_z_chunk(Z, b) for b in batches]
        zc = min(chunks)
        if zc == 1 and max(chunks) > 1:
            # The bare probe already ran zc=1 at the largest batch but
            # bigger chunks at the smaller ones — one rung pinning
            # zc=1 everywhere is still a new program set worth trying.
            return f"{base}@1"
    nxt = zc // 2
    while nxt > 1 and Z % nxt:
        nxt //= 2
    return f"{base}@{max(nxt, 1)}" if zc > 1 else None


def gate_fused_variants(
    tails: Iterable[str] = GATE_TAILS,
    batch: Union[int, Sequence[int]] = 256,
    timeout: float = 900.0,
    log=None,
    arena: str = "",
) -> List[str]:
    """Return the subset of `tails` that survive compile+execute.

    `batch` (one int or a sequence — a multi-bucket service gates
    every distinct padded batch it will compile) and `arena` (a
    --scan_arena CSV spec, '' = training arena) select the exact
    kernel programs to vouch for; an ``ok`` means the tail passed at
    every batch. On non-TPU backends every tail passes without
    spawning anything (interpret mode, no Mosaic). On TPU, tails are
    probed in child processes; a tail whose child dies (signal,
    abort, nonzero exit) is dropped — except 'combo', which walks the
    z_chunk fallback ladder (module docstring) and may come back as
    'combo@<zc>' in the result. If a child HANGS past `timeout`
    (tunnel outage, not a kernel problem), the tails probed so far
    are returned and the rest are dropped — the caller keeps its
    one-JSON-line contract either way.
    """
    import jax

    tails = list(tails)
    batches = sorted(
        {int(b) for b in (batch if hasattr(batch, "__iter__") else (batch,))}
    )
    if jax.default_backend() != "tpu":
        return tails

    def note(msg: str) -> None:
        if log is not None:
            log(msg)

    def ladder(spec: str) -> List[str]:
        nxt = _zc_ladder_next(spec, batches, arena)
        if nxt:
            note(f"mosaic gate: retrying {nxt} (fallback ladder)")
            return [nxt]
        return []

    passed: List[str] = []
    remaining = tails
    while remaining:
        cmd = [
            sys.executable,
            "-m",
            "radarml_tpu.utils.mosaic_gate",
            "--batch",
            ",".join(str(b) for b in batches),
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
        retry: List[str] = []
        for t in remaining:
            if t in failed:
                note(f"mosaic gate: {t} failed in-child: {failed[t]}")
                retry += ladder(t)
        survivors = [
            t for t in remaining if t not in ok and t not in failed
        ]
        if proc.returncode == 0:
            for t in survivors:  # unknown tail names etc.
                note(f"mosaic gate: {t} not probed by the child")
            remaining = retry
            continue
        # Child died (Mosaic abort / signal) on the first survivor —
        # tails with a catchable 'fail' verdict were already past.
        if survivors:
            dead, rest = survivors[0], survivors[1:]
            tail_err = (proc.stderr or "").strip().splitlines()
            note(
                f"mosaic gate: {dead} crashed the child "
                f"(exit {proc.returncode}"
                + (f"; last stderr: {tail_err[-1][:200]}" if tail_err else "")
                + "); skipping it"
            )
            remaining = ladder(dead) + retry + rest
        else:  # crashed after the last verdict (e.g. at interpreter exit)
            remaining = retry
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
    ap.add_argument("--batch", type=str, default="256",
                    help="comma-separated batch sizes; a tail passes "
                         "only if every batch's program runs")
    ap.add_argument("--arena", type=str, default="",
                    help="--scan_arena CSV spec ('' = training arena)")
    ap.add_argument("tails", nargs="+",
                    help="tail names; 'combo@<zc>' pins the combined "
                         "kernel's z_chunk")
    args = ap.parse_args(argv)
    batches = sorted({int(b) for b in args.batch.split(",")})

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
    cubes_by_batch = {
        b: rng.integers(
            0, 256, size=(b,) + scan_arena.grid_shape, dtype=np.uint8
        )
        for b in batches
    }
    targets_by_batch = {
        b: pad_targets([[(5.0, 5.0, 100.0)]] * b, max_targets=4)
        for b in batches
    }

    packed = {}  # batch → device-resident packed wire layout

    def packed_for(p, b):
        if b not in packed:
            packed[b] = jax.device_put(p.pack_host(cubes_by_batch[b]))
        return packed[b]

    for spec in args.tails:
        tail, zc = split_tail_spec(spec)
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
                interp = jax.default_backend() != "tpu"
                tab = jax.jit(
                    lambda ck: onepass_tables_i8(ck, w, interpret=interp)
                )
                for b in batches:
                    out = tab(packed_for(p, b))
                    _ = jax.device_get(out[0][:1, :1])
            else:
                # spec → exact program: spec_predictor_kwargs is the
                # single source of the combo1 ↔ fused_quant="single"
                # mapping (a different Mosaic program, own gate name).
                p = RadarPredictor(
                    mode="fused", **spec_predictor_kwargs(spec), **kw
                )
                for b in batches:
                    xyz_np, valid_np = targets_by_batch[b]
                    pred, _, _ = p(packed_for(p, b), xyz_np, valid_np)
                    _ = jax.device_get(pred[:1])
        except Exception as e:  # catchable failure — report, keep probing
            print(
                f"fail {spec} {type(e).__name__}: {str(e)[:200]}",
                file=sys.stderr,
                flush=True,
            )
            continue
        print(f"ok {spec}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(_child_main(sys.argv[1:]))
