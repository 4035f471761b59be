"""Probe: what bounds the combined one-pass kernel — steps or bytes?

The combined kernel (ops/pallas_i8_score.CombinedWeights) measures
~3.5M scans/s tables-only while its HBM read (~290 MB/2048-scan batch)
and MXU tile arithmetic both predict ~6M — so ~40% of the batch time
is unexplained. Two suspects, each with a knob that isolates it:

  * per-grid-step overhead (352 steps/batch): `z_chunk` unrolls zc
    z-slices per step — same MACs, same tile passes, 1/zc the steps,
    zc× the DMA size. If steps dominate, zc=2/4 win.
  * lane under-utilization / fixed per-dispatch cost: doubling the
    batch to 4096 halves any fixed cost per scan. If that wins,
    serving should prefer bigger baked batches.

Times every (z_chunk, batch) candidate interleaved per round (the
tunnel's device state drifts on a scale of minutes; only interleaved
medians order candidates defensibly — CLAUDE.md), slope-timed like
bench.py. Prints one JSON line of scans/s per candidate.

Run on the TPU from the repo root. The raw Mosaic programs differ per
(zc, batch), so each candidate is gated in a child process first via
a direct compile probe here (the mosaic_gate CLI gates predictor
tails, not raw-kernel knobs).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

# Runnable as `python benchmarks/zc_probe.py` from the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLOPE_KW = {}

# Quantization levels of the combined weights under probe (2 = the
# bit-parity hi/lo split stack, 1 = fused_quant="single"'s q1-only
# stack — half the rows AND half the VMEM-resident accumulators, so
# its VMEM frontier may sit at different (zc, batch) points than the
# split kernel's measured zc·B <= 8192 rule). Carried in the
# environment so the gate children (spawned via `python -c`) probe
# the same program the parent times.
_LEVELS_ENV = "RADARML_ZC_LEVELS"


def _levels() -> int:
    return int(os.environ.get(_LEVELS_ENV, "2"))


def slope(call, fetch):
    from radarml_tpu.utils.slopetime import slope_time

    return slope_time(call, fetch, **SLOPE_KW)


def _gate(cands, timeout: float = 1200.0):
    """Probe (zc, batch) candidates in child processes; return the set
    that compiles+executes. One child probes the whole list (printing
    'ok zc,batch' after each — mosaic_gate's protocol); a hard Mosaic
    abort kills only the candidate it happened on, and the parent
    re-spawns for the remainder."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    passed = set()
    remaining = list(cands)
    while remaining:
        spec = ";".join(f"{zc},{b}" for zc, b in remaining)
        code = (
            "import benchmarks.zc_probe as p; p.gate_child('" + spec + "')"
        )
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], cwd=root,
                capture_output=True, text=True, timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            return passed
        ok = {
            tuple(int(v) for v in line[3:].split(","))
            for line in (r.stdout or "").splitlines()
            if line.startswith("ok ")
        }
        passed |= {c for c in remaining if c in ok}
        survivors = [c for c in remaining if c not in ok]
        if r.returncode == 0 or not survivors:
            return passed
        remaining = survivors[1:]  # survivors[0] crashed the child
    return passed


def gate_child(spec: str) -> None:
    """Child body: probe each 'zc,batch' candidate in `spec` in order."""
    cands = [tuple(int(v) for v in s.split(",")) for s in spec.split(";")]
    jax, w, packer = _setup(max(b for _, b in cands))
    from radarml_tpu.core.arena import DEFAULT_ARENA
    from radarml_tpu.ops.pallas_i8_score import onepass_tables_combined_i8

    rng = np.random.default_rng(7)
    interp = jax.default_backend() != "tpu"
    kp = {}
    for zc, batch in cands:
        if batch not in kp:
            cubes = rng.integers(
                0, 256, (batch,) + DEFAULT_ARENA.grid_shape, dtype=np.uint8
            )
            kp[batch] = jax.device_put(packer.pack_host(cubes))
        out = jax.jit(
            lambda ck, zc=zc: onepass_tables_combined_i8(
                ck, w, interpret=interp, z_chunk=zc
            )
        )(kp[batch])
        _ = jax.device_get(out[0][:1, :1])
        print(f"ok {zc},{batch}", flush=True)


def _setup(batch: int, cpu: bool = False):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/radarml_jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from radarml_tpu.apps.common_cli import warm_transfers

    warm_transfers()

    from radarml_tpu.core.arena import DEFAULT_ARENA
    from radarml_tpu.data.labels import LabelEncoder
    from radarml_tpu.data.synthetic import make_dataset
    from radarml_tpu.models.linear import (
        SGDConfig, calibrate_ovr, sgd_fit, sgd_model,
    )
    from radarml_tpu.models.pipeline import RadarPredictor
    from radarml_tpu.ops.features import process_samples
    from radarml_tpu.ops.pallas_i8_score import build_combined_weights

    samples, labels = make_dataset(60, seed=11)
    le, y = LabelEncoder.fit_transform(labels)
    X = process_samples(samples, scale=True).astype(np.float32)
    cfg = SGDConfig(alpha=1e-5)
    state = sgd_fit(X[:45], y[:45], n_classes=len(le.classes_), cfg=cfg,
                    epochs=5)
    model = sgd_model(state, cfg)
    calib = calibrate_ovr(model, X[45:], y[45:])
    packer = RadarPredictor(
        train_arena=DEFAULT_ARENA, scan_arena=DEFAULT_ARENA, model=model,
        calibration=calib, min_proba=0.7, mode="fused",
    )
    a = DEFAULT_ARENA
    lv = _levels()
    quant = packer._quantized_split_templates(levels=lv)
    w = build_combined_weights(
        quant, (a.size_x, a.size_y, a.size_z),
        y_group=packer._pack_y_group, levels=lv,
    )
    return jax, w, packer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--zc", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--batches", type=int, nargs="+", default=[2048, 4096])
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke run (interpret kernels, tiny slopes)")
    ap.add_argument("--levels", type=int, default=2, choices=[1, 2],
                    help="combined-weight quantization levels: 2 = the "
                         "bit-parity split stack (default), 1 = the "
                         "fused_quant='single' q1-only stack")
    args = ap.parse_args()

    os.environ[_LEVELS_ENV] = str(args.levels)
    if args.cpu:
        SLOPE_KW.update(k_lo=1, k_hi=2, reps=1, min_signal_s=0.0)

    cands = [(zc, b) for b in args.batches for zc in args.zc]
    if args.cpu:
        gated = set(cands)
    else:
        gated = _gate(cands)
        for c in cands:
            if c not in gated:
                print(f"# gate rejected zc={c[0]} batch={c[1]}",
                      file=sys.stderr)

    jax, w, packer = _setup(max(args.batches), cpu=args.cpu)
    from radarml_tpu.core.arena import DEFAULT_ARENA
    from radarml_tpu.ops.pallas_i8_score import onepass_tables_combined_i8

    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(7)
    a = DEFAULT_ARENA

    timers = {}
    for batch in args.batches:
        cubes = rng.integers(
            0, 256, (batch,) + a.grid_shape, dtype=np.uint8
        )
        cube_k = jax.device_put(packer.pack_host(cubes))
        for zc in args.zc:
            if (zc, batch) not in gated:
                continue
            fn = jax.jit(
                lambda ck, zc=zc: onepass_tables_combined_i8(
                    ck, w, interpret=interp, z_chunk=zc
                )
            )
            _ = jax.device_get(fn(cube_k)[0][:1, :1])  # warm
            timers[f"zc{zc}_b{batch}"] = (
                lambda fn=fn, ck=cube_k, b=batch: b / slope(
                    lambda: fn(ck),
                    lambda o: jax.device_get(o[0][:1, :1]),
                )
            )
        print(f"# warmed batch={batch}", file=sys.stderr)

    runs = {k: [] for k in timers}
    for rnd in range(args.rounds):
        if rnd > 0:
            time.sleep(3)
        for k, t in timers.items():
            runs[k].append(t())
        print(f"# round {rnd} done", file=sys.stderr)

    print(json.dumps({
        **{f"scans_per_sec_{k}": round(float(np.median(v)), 1)
           for k, v in runs.items()},
        "rounds": {k: [round(x, 1) for x in v] for k, v in runs.items()},
        "device": str(jax.devices()[0].device_kind),
        "levels": _levels(),
    }))


if __name__ == "__main__":
    main()
