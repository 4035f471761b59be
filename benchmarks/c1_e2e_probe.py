"""Probe: the single-level predictor END-TO-END at its measured-best
kernel operating point (batch 8192/zc=1), interleaved against the
batch-4096 point and the bit-parity combo anchor in the same rounds.

benchmarks/ZC_PROBE_C1.json measured the levels=1 KERNEL at 5.78M
scans/s tables-only at batch 8192/zc=1 (vs 5.57M at 4096/zc=2); this
probe asks whether the full predictor (`RadarPredictor(mode="fused",
fused_quant="single")` — packing, stacked dot, dequant+lookup tail,
calibration) keeps that ordering, i.e. whether bulk single-level
serving should bake batch 8192. Same methodology as bench.py:
slope-timed, interleaved per round, medians (CLAUDE.md — single-shot
numbers are anecdotes under tunnel drift).

Run on the TPU from the repo root. Candidates gated like bench.py via
utils/mosaic_gate (Mosaic rejections can be hard SIGABRTs).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# Runnable as `python benchmarks/c1_e2e_probe.py` from the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLOPE_KW = {}


def slope(call, fetch):
    from radarml_tpu.utils.slopetime import slope_time

    return slope_time(call, fetch, **SLOPE_KW)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--batches", type=int, nargs="+", default=[4096, 8192])
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke run (interpret kernels, tiny slopes)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        SLOPE_KW.update(k_lo=1, k_hi=2, reps=1, min_signal_s=0.0)
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
    from radarml_tpu.utils.mosaic_gate import gate_fused_variants, resolve_tail

    samples, labels = make_dataset(60, seed=11)
    le, y = LabelEncoder.fit_transform(labels)
    from radarml_tpu.ops.features import process_samples

    X = process_samples(samples, scale=True).astype(np.float32)
    cfg = SGDConfig(alpha=1e-5)
    state = sgd_fit(X[:45], y[:45], n_classes=len(le.classes_), cfg=cfg,
                    epochs=5)
    model = sgd_model(state, cfg)
    calib = calibrate_ovr(model, X[45:], y[45:])
    kw = dict(train_arena=DEFAULT_ARENA, scan_arena=DEFAULT_ARENA,
              model=model, calibration=calib, min_proba=0.0)

    # Gate every program this probe compiles, at its exact batch
    # (combo1 per batch for the single-level points; combo at the
    # smallest batch as the bit-parity anchor).
    on_tpu = not args.cpu and jax.default_backend() == "tpu"
    anchor_b = min(args.batches)
    cands = []  # (name, tail_spec_base, quant, batch)
    for b in args.batches:
        cands.append((f"c1_b{b}", "combo1", "single", b))
    cands.append((f"combo_b{anchor_b}", "combo", "split", anchor_b))

    zc_of = {}
    if on_tpu:
        kept = []
        for name, spec, _, b in cands:
            ok_specs = gate_fused_variants((spec,), batch=b,
                                           log=lambda *a: None)
            ok, zc = resolve_tail(ok_specs, spec)
            if not ok:
                print(f"# gate rejected {name}", file=sys.stderr)
                continue
            zc_of[name] = zc
            kept.append(name)
        cands = [c for c in cands if c[0] in kept]

    rng = np.random.default_rng(7)
    timers = {}
    T = 4
    for name, _, quant, b in cands:
        pred = RadarPredictor(
            mode="fused", fused_quant=quant,
            fused_z_chunk=zc_of.get(name), **kw,
        )
        cubes = rng.integers(
            0, 256, (b,) + DEFAULT_ARENA.grid_shape, dtype=np.uint8
        )
        cube_k = jax.device_put(pred.pack_host(cubes))
        xyz = np.stack(
            [rng.integers(0, hi, (b, T)) for hi in
             (DEFAULT_ARENA.size_x, DEFAULT_ARENA.size_y,
              DEFAULT_ARENA.size_z)], axis=-1,
        ).astype(np.int32)
        valid = np.ones((b, T), bool)
        pxyz = jax.device_put(xyz)
        pvalid = jax.device_put(valid)
        _ = jax.device_get(pred(cube_k, pxyz, pvalid)[0][:1])  # warm
        timers[name] = (
            lambda p=pred, ck=cube_k, px=pxyz, pv=pvalid, b=b: b / slope(
                lambda: p(ck, px, pv),
                lambda o: jax.device_get(o[0][:1]),
            )
        )
        print(f"# warmed {name}", file=sys.stderr)

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
        "z_chunk": {k: v for k, v in zc_of.items()},
        "device": str(jax.devices()[0].device_kind),
    }))


if __name__ == "__main__":
    main()
