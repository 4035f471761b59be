"""Probe: one-read int8 Pallas kernel vs the 3-read fast_i8 XLA path.

Measures, in ONE process (tunnel-state swings exceed cross-process
differences — CLAUDE.md), slope-timed like bench.py, all through the
production RadarPredictor API:

  * fast_i8      — mode="fast", cube_dtype="int8" (3 cube reads,
                   s8 MXU dots; README floor ~2.3M)
  * fused        — mode="fused", fused_tail="lookup": one-pass kernel
                   + XLA masked-sum lookup tail
  * fused_sel    — fused_tail="sel": z-table selection in-kernel
  * fused_sel3   — fused_tail="sel3": ALL lookups in-kernel,
                   dequant-only tail
  * fused tables only — the raw kernel without any tail

Prints one JSON line. Run on the TPU from the repo root.
"""

import argparse
import json
import os
import sys

import numpy as np

# Runnable as `python benchmarks/onepass_probe.py` from the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 2048
MAX_TARGETS = 4


SLOPE_KW = {}  # --cpu smoke mode shrinks K/reps


def slope(call, fetch):
    from radarml_tpu.utils.slopetime import slope_time

    return slope_time(call, fetch, **SLOPE_KW)


def main():
    global BATCH
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU backend smoke run (interpret-mode kernels)")
    ap.add_argument("--rounds", type=int, default=1,
                    help="interleaved timing rounds per variant. The dev "
                         "tunnel's device state drifts on a scale of "
                         "minutes — single-shot per-variant rates "
                         "measured back-to-back can reorder between "
                         "runs (observed 2x swings). Interleaving R "
                         "rounds over ALL variants and taking medians "
                         "makes the ordering defensible.")
    args = ap.parse_args()
    BATCH = args.batch

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        # Interpret-mode kernels are orders of magnitude slower; keep
        # the smoke run about correctness, not rates.
        # min_signal_s=0 disables adaptive K escalation (slopetime.py).
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
    from radarml_tpu.data.synthetic import make_dataset, make_scan_batch
    from radarml_tpu.models.linear import (
        SGDConfig, calibrate_ovr, sgd_fit, sgd_model,
    )
    from radarml_tpu.models.pipeline import (
        RadarPredictor, encode_int8_cubes, pad_targets,
    )
    from radarml_tpu.ops.features import process_samples
    from radarml_tpu.ops.pallas_i8_score import (
        build_onepass_weights, onepass_tables_i8,
    )

    samples, labels = make_dataset(90, seed=11)
    le, y = LabelEncoder.fit_transform(labels)
    X = process_samples(samples, scale=True).astype(np.float32)
    cfg = SGDConfig(alpha=1e-5)
    state = sgd_fit(X[:70], y[:70], n_classes=len(le.classes_), cfg=cfg,
                    epochs=15)
    model = sgd_model(state, cfg)
    calib = calibrate_ovr(model, X[70:], y[70:])

    kw = dict(train_arena=DEFAULT_ARENA, scan_arena=DEFAULT_ARENA,
              model=model, calibration=calib, min_proba=0.7)

    # Mosaic rejections can be hard aborts no try/except catches —
    # probe each fused variant (and the raw tables-only kernel) in a
    # child process first (utils/mosaic_gate). Free on CPU.
    from radarml_tpu.utils.mosaic_gate import gate_fused_variants

    ok = set(gate_fused_variants(
        tails=("lookup", "glookup", "combo", "sel", "sel3", "tables"),
        batch=BATCH,  # probe the exact program the probe will compile
        log=lambda m: print(f"# {m}", file=sys.stderr),
    ))
    gate_errors = {
        f"fused_{t}" if t != "lookup" else "fused": "mosaic gate rejected"
        for t in ("lookup", "glookup", "combo", "sel", "sel3")
        if t not in ok
    }

    predictors = {
        "fast_i8": RadarPredictor(mode="fast", cube_dtype="int8", **kw),
    }
    if "lookup" in ok:
        predictors["fused"] = RadarPredictor(mode="fused", **kw)
    if "glookup" in ok:
        predictors["fused_glookup"] = RadarPredictor(
            mode="fused", fused_tail="glookup", **kw)
    if "combo" in ok:
        predictors["fused_combo"] = RadarPredictor(
            mode="fused", fused_tail="combo", **kw)
    if "sel" in ok:
        predictors["fused_sel"] = RadarPredictor(
            mode="fused", fused_tail="sel", **kw)
    if "sel3" in ok:
        predictors["fused_sel3"] = RadarPredictor(
            mode="fused", fused_tail="sel3", **kw)

    cubes_np, targets = make_scan_batch(BATCH, seed=7)
    cubes_np = np.rint(cubes_np)
    xyz_np, valid_np = pad_targets(
        [[(t.x, t.y, t.z)] for t in targets], max_targets=MAX_TARGETS
    )
    xyz = jax.device_put(xyz_np)
    valid = jax.device_put(valid_np)
    cubes_i8 = jax.device_put(encode_int8_cubes(cubes_np))
    # one universal fused wire layout (tail-independent, keyed on the
    # arena): pack once, serve every tail. Constructing a predictor is
    # host-side only (no kernel compile), so the packer is always safe
    # to build even when the gate rejected every fused tail.
    packer = predictors.get("fused") or RadarPredictor(mode="fused", **kw)
    need_pack = any(n != "fast_i8" for n in predictors) or "tables" in ok
    packed_once = (
        jax.device_put(packer.pack_host(cubes_np.astype(np.uint8)))
        if need_pack else None
    )
    packed = {
        name: packed_once
        for name in predictors if name != "fast_i8"
    }

    def inputs(name):
        return (cubes_i8 if name == "fast_i8" else packed[name], xyz, valid)

    # warmup + agreement check (all paths share the same quantized
    # templates and exact integer table arithmetic). Each variant is
    # isolated: the sel/sel3 kernels push Mosaic features (3D scratch,
    # dynamic leading index, (Z, NG) grids) that interpret mode can't
    # vouch for, and one rejection must not cost the whole run.
    preds, probas, errors = {}, {}, dict(gate_errors)
    for name, p in predictors.items():
        try:
            pk, _, prk = p(*inputs(name))
            preds[name], probas[name] = np.asarray(pk), np.asarray(prk)
        except Exception as e:  # noqa: BLE001 — record and keep probing
            errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
    ref = "fast_i8" if "fast_i8" in preds else next(iter(preds), None)
    agree = {
        name: bool(np.array_equal(preds[name], preds[ref]))
        for name in preds if ref is not None and name != ref
    }
    derr = max(
        (float(np.max(np.abs(probas[n] - probas[ref])))
         for n in agree),
        default=float("nan"),
    )

    # Timing closures, all warm after the agreement pass above; the
    # raw tables-only kernel (no scoring tail) joins as the fused
    # paths' upper bound.
    timers = {
        name: (lambda p=p, name=name: BATCH / slope(
            lambda: p(*inputs(name)),
            lambda o: jax.device_get(o[0][:1]),
        ))
        for name, p in predictors.items() if name not in errors
    }
    try:
        if "tables" not in ok:
            raise RuntimeError("mosaic gate rejected")
        quant = packer._quantized_split_templates()
        a = DEFAULT_ARENA
        w = build_onepass_weights(
            quant, (a.size_x, a.size_y, a.size_z),
            y_group=packer._pack_y_group,
        )
        interp = jax.devices()[0].platform != "tpu"
        tab = jax.jit(lambda ck: onepass_tables_i8(ck, w, interpret=interp))
        cube_k = packed_once  # same universal wire layout as w
        _ = jax.device_get(tab(cube_k)[0][:1])  # warm
        timers["fused_tables_only"] = lambda: BATCH / slope(
            lambda: tab(cube_k), lambda o: jax.device_get(o[0][:1, :1])
        )
    except Exception as e:  # noqa: BLE001
        errors["fused_tables_only"] = f"{type(e).__name__}: {str(e)[:200]}"
    try:
        # The grouped kernel's own tail-free upper bound (glookup =
        # this + the XLA lookup tail); the ungrouped tables rate above
        # is NOT an upper bound for glookup, which does ~29% fewer
        # MACs and 1/NG the w1 weight traffic.
        if "glookup" not in ok:
            raise RuntimeError("mosaic gate rejected")
        from radarml_tpu.ops.pallas_i8_score import (
            build_grouped_weights, onepass_tables_grouped_i8,
        )

        quant_g = packer._quantized_split_templates()
        a = DEFAULT_ARENA
        wg = build_grouped_weights(
            quant_g, (a.size_x, a.size_y, a.size_z),
            y_group=packer._pack_y_group,
        )
        interp = jax.devices()[0].platform != "tpu"
        gtab = jax.jit(
            lambda ck: onepass_tables_grouped_i8(ck, wg, interpret=interp)
        )
        _ = jax.device_get(gtab(packed_once)[0][:1])  # warm
        timers["fused_gtables_only"] = lambda: BATCH / slope(
            lambda: gtab(packed_once),
            lambda o: jax.device_get(o[0][:1, :1]),
        )
    except Exception as e:  # noqa: BLE001
        errors["fused_gtables_only"] = f"{type(e).__name__}: {str(e)[:200]}"
    try:
        # The combined kernel's tail-free upper bound (combo = this +
        # the XLA lookup tail): one stacked dot per step — half the
        # grouped kernel's MXU tile passes (ops CombinedWeights).
        if "combo" not in ok:
            raise RuntimeError("mosaic gate rejected")
        from radarml_tpu.ops.pallas_i8_score import (
            build_combined_weights, onepass_tables_combined_i8,
        )

        quant_c = packer._quantized_split_templates()
        a = DEFAULT_ARENA
        wc = build_combined_weights(
            quant_c, (a.size_x, a.size_y, a.size_z),
            y_group=packer._pack_y_group,
        )
        interp = jax.devices()[0].platform != "tpu"
        ctab = jax.jit(
            lambda ck: onepass_tables_combined_i8(ck, wc, interpret=interp)
        )
        _ = jax.device_get(ctab(packed_once)[0][:1])  # warm
        timers["fused_ctables_only"] = lambda: BATCH / slope(
            lambda: ctab(packed_once),
            lambda o: jax.device_get(o[0][:1, :1]),
        )
    except Exception as e:  # noqa: BLE001
        errors["fused_ctables_only"] = f"{type(e).__name__}: {str(e)[:200]}"

    # Interleaved rounds: every variant is measured in every round, so
    # a device-state episode hits all variants alike instead of
    # whichever happened to be on the bench at the time.
    runs = {name: [] for name in timers}
    for _ in range(max(args.rounds, 1)):
        for name, t in timers.items():
            try:
                runs[name].append(t())
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
    rates = {
        name: float(np.median(v)) for name, v in runs.items() if v
    }
    r_tab = rates.pop("fused_tables_only", float("nan"))
    r_gtab = rates.pop("fused_gtables_only", float("nan"))
    r_ctab = rates.pop("fused_ctables_only", float("nan"))

    best = max(rates, key=rates.get) if rates else None
    print(json.dumps({
        **{f"scans_per_sec_{k}": round(v, 1) for k, v in rates.items()},
        "scans_per_sec_fused_tables_only": round(r_tab, 1),
        "scans_per_sec_fused_gtables_only": round(r_gtab, 1),
        "scans_per_sec_fused_ctables_only": round(r_ctab, 1),
        "rounds": {k: [round(x, 1) for x in v] for k, v in runs.items()},
        "best": best,
        "best_over_fast": round(rates[best] / rates["fast_i8"], 3)
        if best is not None and "fast_i8" in rates else None,
        "pred_agreement": all(agree.values()) if agree else None,
        "agreement": agree,
        "max_proba_diff": derr,
        "errors": errors,
        "batch": BATCH,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
