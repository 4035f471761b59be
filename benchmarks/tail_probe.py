"""Locate the fused-mode scoring-tail cost stage by stage.

BENCH r04 (drift-robust paired-median slope_time) shows a consistent
~0.4 ms/batch gap between the raw grouped kernel
(onepass_tables_grouped_i8, ~3.2M scans/s at batch 2048) and the full
fused pipeline (~1.5-1.8M) — i.e. the XLA scoring tail costs ~40% of
the end-to-end rate even though its table traffic is ~12% of the cube
read. This probe times the pipeline cut after each tail stage, all
stages interleaved per round so drift hits them alike:

  tables   — kernel only (fetch one table element)
  dequant  — + int32→f32 dequantization of all three tables
  lookup   — + masked-sum index selection to (B, T, C) decisions
  calib    — + calibration, argmax, thresholding (the full tail)
  pipeline — RadarPredictor(mode="fused", fused_tail=...) as shipped

Prints one JSON line with per-stage scans/s medians and the implied
per-stage ms cost. Run from the repo root; --cpu for a smoke run.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 2048
MAX_TARGETS = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--tail", default="glookup",
                    choices=["lookup", "glookup"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/radarml_jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from radarml_tpu.apps.common_cli import warm_transfers
    from radarml_tpu.core.arena import DEFAULT_ARENA
    from radarml_tpu.data.labels import LabelEncoder
    from radarml_tpu.data.synthetic import make_dataset, make_scan_batch
    from radarml_tpu.models.linear import (
        SGDConfig, calibrate_ovr, sgd_fit, sgd_model,
    )
    from radarml_tpu.models.pipeline import RadarPredictor, pad_targets
    from radarml_tpu.ops.features import process_samples
    from radarml_tpu.utils.slopetime import slope_time

    warm_transfers()

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
    predictor = RadarPredictor(mode="fused", fused_tail=args.tail, **kw)

    B = args.batch
    cubes_np, targets = make_scan_batch(B, seed=7)
    cubes_np = np.rint(cubes_np)
    xyz_np, valid_np = pad_targets(
        [[(t.x, t.y, t.z)] for t in targets], max_targets=MAX_TARGETS
    )
    xyz = jax.device_put(xyz_np)
    valid = jax.device_put(valid_np)
    cube_k = jax.device_put(predictor.pack_host(cubes_np.astype(np.uint8)))

    # --- build the staged programs out of the predictor's own pieces --
    from radarml_tpu.ops.pallas_i8_score import (
        build_grouped_weights, build_onepass_weights,
        onepass_tables_grouped_i8, onepass_tables_i8,
    )

    quant = predictor._quantized_split_templates()
    dims = (DEFAULT_ARENA.size_x, DEFAULT_ARENA.size_y, DEFAULT_ARENA.size_z)
    yg = predictor._pack_y_group
    interp = jax.default_backend() != "tpu"
    if args.tail == "glookup":
        w = build_grouped_weights(quant, dims, y_group=yg)
        kern = lambda ck: onepass_tables_grouped_i8(ck, w, interpret=interp)
    else:
        w = build_onepass_weights(quant, dims, y_group=yg)
        kern = lambda ck: onepass_tables_i8(ck, w, interpret=interp)

    C = model.intercept.shape[0]
    scales = [(q[1], q[2], q[3]) if q is not None else None for q in quant]

    def dequant_cd(m, sc):
        s1, s2, _ = sc
        return (m[:C].astype(jnp.float32) * s1[:, None, None]
                + m[C:].astype(jnp.float32) * s2[:, None, None])

    def dequant_dc(m, sc):
        s1, s2, _ = sc
        return (m[:, :C].astype(jnp.float32) * s1[None, :, None]
                + m[:, C:].astype(jnp.float32) * s2[None, :, None])

    def lookup_cd(m_cdb, idx):
        D = m_cdb.shape[1]
        eq = (jax.lax.broadcasted_iota(jnp.int32, (1, D, 1, 1), 1)
              == idx.T[None, None, :, :])
        return jnp.sum(m_cdb[:, :, None, :] * eq, axis=1).transpose(2, 1, 0)

    def lookup_dc(m_dcb, idx):
        D = m_dcb.shape[0]
        eq = (jax.lax.broadcasted_iota(jnp.int32, (D, 1, 1, 1), 0)
              == idx.T[None, None, :, :])
        return jnp.sum(m_dcb[:, :, None, :] * eq, axis=0).transpose(2, 1, 0)

    scan = DEFAULT_ARENA
    idx_fn = jax.vmap(jax.vmap(
        lambda p: jnp.stack(scan.clamped_matrix_indices(p[0], p[1], p[2]))
    ))
    intercept = model.intercept

    @jax.jit
    def f_tables(ck):
        return kern(ck)

    @jax.jit
    def f_dequant(ck):
        m1, m2, m3 = kern(ck)
        return (dequant_cd(m1, scales[0]), dequant_cd(m2, scales[1]),
                dequant_dc(m3, scales[2]))

    @jax.jit
    def f_lookup(ck, txyz):
        ijk = idx_fn(txyz).astype(jnp.int32)
        m1, m2, m3 = kern(ck)
        Bn, T = txyz.shape[:2]
        dec = jnp.broadcast_to(intercept[None, None, :], (Bn, T, C))
        dec = dec + lookup_dc(dequant_dc(m3, scales[2]), ijk[..., 2]) \
            + scales[2][2]
        dec = dec + lookup_cd(dequant_cd(m1, scales[0]), ijk[..., 1]) \
            + scales[0][2]
        dec = dec + lookup_cd(dequant_cd(m2, scales[1]), ijk[..., 0]) \
            + scales[1][2]
        return dec

    f_full = predictor._fn  # calib + argmax + threshold on top

    def pipeline_call():
        return predictor(cube_k, xyz, valid)

    stages = {
        "tables": (lambda: f_tables(cube_k),
                   lambda o: jax.device_get(o[0][:1, :1])),
        "dequant": (lambda: f_dequant(cube_k),
                    lambda o: jax.device_get(o[0][:1, :1])),
        "lookup": (lambda: f_lookup(cube_k, xyz),
                   lambda o: jax.device_get(o[:1, :1])),
        "calib": (lambda: f_full(cube_k, xyz, valid),
                  lambda o: jax.device_get(o[0][:1])),
        "pipeline": (pipeline_call,
                     lambda o: jax.device_get(o[0][:1])),
    }

    # warmup/compile
    for name, (call, fetch) in stages.items():
        fetch(call())
        print(f"# {name} compiled", file=sys.stderr, flush=True)

    kwslope = dict(k_lo=1, k_hi=2, reps=1, min_signal_s=0.0) if args.cpu \
        else {}
    runs = {name: [] for name in stages}
    for rnd in range(args.rounds):
        if rnd > 0:
            time.sleep(2)
        for name, (call, fetch) in stages.items():
            runs[name].append(B / slope_time(call, fetch, **kwslope))

    med = {k: float(np.median(v)) for k, v in runs.items()}
    out = {
        "tail": args.tail,
        "batch": B,
        "scans_per_sec": {k: round(v, 1) for k, v in med.items()},
        "per_batch_ms": {k: round(1e3 * B / med[k], 3) for k in med},
        "stage_cost_ms": {},
        "rounds": {k: [round(x, 1) for x in v] for k, v in runs.items()},
        "device": str(jax.devices()[0]),
    }
    order = ["tables", "dequant", "lookup", "calib"]
    prev = None
    for k in order:
        cur = 1e3 * B / med[k]
        if prev is not None:
            out["stage_cost_ms"][k] = round(cur - prev[1], 3)
        prev = (k, cur)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
