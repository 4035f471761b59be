"""Probe: one-read int8 Pallas kernel vs the 3-read fast_i8 XLA path.

Measures, in ONE process (tunnel-state swings exceed cross-process
differences — CLAUDE.md), slope-timed like bench.py:

  * fast_i8  — the serving fast path with cube_dtype="int8"
               (3 cube reads, s8 MXU dots; README floor ~2.3M)
  * fused    — ops/pallas_i8_score one-pass kernel + dequant/lookup
               tail (1 cube read + streamed weights; ceiling ~4.5M)
  * fused tables only — the raw kernel without the scoring tail

Prints one JSON line. Run on the TPU from the repo root.
"""

import json
import time

import numpy as np

BATCH = 2048
MAX_TARGETS = 4


def slope(call, fetch, k_lo=2, k_hi=12, reps=3):
    times = {}
    for k in (k_lo, k_hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = call()
            fetch(out)
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp

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
        build_onepass_weights, onepass_scores_i8, onepass_tables_i8,
        onepass_tables_sel_i8, pack_cubes_i8,
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
    fast = RadarPredictor(mode="fast", cube_dtype="int8", **kw)

    cubes_np, targets = make_scan_batch(BATCH, seed=7)
    cubes_np = np.rint(cubes_np)
    xyz_np, valid_np = pad_targets(
        [[(t.x, t.y, t.z)] for t in targets], max_targets=MAX_TARGETS
    )
    xyz = jax.device_put(xyz_np)
    valid = jax.device_put(valid_np)
    cubes_i8 = jax.device_put(encode_int8_cubes(cubes_np))
    cube_k = jax.device_put(pack_cubes_i8(cubes_np.astype(np.uint8)))

    a = DEFAULT_ARENA
    dims = (a.size_x, a.size_y, a.size_z)
    quant = fast._quantized_split_templates()
    w = build_onepass_weights(quant, dims)
    scales = [(q[1], q[2], q[3]) for q in quant]
    intercept = model.intercept
    C = intercept.shape[0]
    scan = a
    idx_fn = jax.vmap(jax.vmap(
        lambda p: jnp.stack(scan.clamped_matrix_indices(p[0], p[1], p[2]))
    ))
    from radarml_tpu.models.linear import calibrated_from_decision

    def lookup_c2(m_c2db, idx):
        """(C2, D, B) raw table, (B, T) indices → (B, T, C2) reads.

        Lane-wise masked-sum: scans are the minor dim, so per-scan
        dynamic reads become an iota-compare mask fused into one
        streaming reduction over the table — no transposes, no
        B-batched tiny matmuls.
        """
        D = m_c2db.shape[1]
        eq = (
            jax.lax.broadcasted_iota(jnp.int32, (1, D, 1, 1), 1)
            == idx.T[None, None, :, :]
        )  # (1, D, T, B)
        r = jnp.sum(
            m_c2db[:, :, None, :].astype(jnp.float32) * eq, axis=1
        )  # (C2, T, B)
        return r.transpose(2, 1, 0)

    def lookup_dc2(m_dc2b, idx):
        """(D, C2, B) raw table (kernel-native m3 order) → (B, T, C2)."""
        D = m_dc2b.shape[0]
        eq = (
            jax.lax.broadcasted_iota(jnp.int32, (D, 1, 1, 1), 0)
            == idx.T[None, None, :, :]
        )  # (D, 1, T, B)
        r = jnp.sum(
            m_dc2b[:, :, None, :].astype(jnp.float32) * eq, axis=0
        )  # (C2, T, B)
        return r.transpose(2, 1, 0)

    def combine(r, sc):
        s1, s2, const = sc
        return (r[..., :C] * s1 + r[..., C:] * s2 + const)

    @jax.jit
    def fused(cube_k, target_xyz, target_valid):
        B, T = target_xyz.shape[:2]
        m1, m2, m3 = onepass_tables_i8(cube_k, w)
        ijk = idx_fn(target_xyz).astype(jnp.int32)
        dec = (
            intercept[None, None, :]
            + combine(lookup_c2(m1, ijk[..., 1]), scales[0])
            + combine(lookup_c2(m2, ijk[..., 0]), scales[1])
            + combine(lookup_dc2(m3, ijk[..., 2]), scales[2])
        )
        proba = calibrated_from_decision(dec.reshape(B * T, C), calib)
        proba = proba.reshape(B, T, C)
        best = jnp.argmax(proba, axis=-1).astype(jnp.int32)
        best_p = jnp.max(proba, axis=-1)
        pred = jnp.where(best_p >= 0.7, best, -1)
        pred = jnp.where(target_valid, pred, -1)
        return pred, best_p, proba

    @jax.jit
    def fused_gather(cube_k, target_xyz, target_valid):
        """Tail variant: take_along_axis gathers on the raw tables."""
        B, T = target_xyz.shape[:2]
        m1, m2, m3 = onepass_tables_i8(cube_k, w)
        ijk = idx_fn(target_xyz).astype(jnp.int32)

        def gsel(m_c2db, idx):  # (C2, D, B) @ (B, T) -> (B, T, C2)
            C2 = m_c2db.shape[0]
            ix = jnp.broadcast_to(idx.T[None], (C2,) + idx.T.shape)
            r = jnp.take_along_axis(
                m_c2db.astype(jnp.float32), ix, axis=1
            )  # (C2, T, B)
            return r.transpose(2, 1, 0)

        dec = (
            intercept[None, None, :]
            + combine(gsel(m1, ijk[..., 1]), scales[0])
            + combine(gsel(m2, ijk[..., 0]), scales[1])
            + combine(gsel(m3.transpose(1, 0, 2), ijk[..., 2]), scales[2])
        )
        proba = calibrated_from_decision(dec.reshape(B * T, C), calib)
        proba = proba.reshape(B, T, C)
        best = jnp.argmax(proba, axis=-1).astype(jnp.int32)
        best_p = jnp.max(proba, axis=-1)
        pred = jnp.where(best_p >= 0.7, best, -1)
        pred = jnp.where(target_valid, pred, -1)
        return pred, best_p, proba

    @jax.jit
    def fused_sel(cube_k, target_xyz, target_valid):
        """Tail variant: z-table row selection folded into the kernel.

        The (Z, C2, B) table never reaches HBM — the kernel keeps
        only each target's own z-row, so the tail drops its largest
        masked-sum (D=176) entirely.
        """
        B, T = target_xyz.shape[:2]
        ijk = idx_fn(target_xyz).astype(jnp.int32)
        kidx = jnp.where(target_valid, ijk[..., 2], -1)
        m1, m2, d3 = onepass_tables_sel_i8(cube_k, w, kidx)
        r3 = d3[:, :T, :].transpose(2, 1, 0).astype(jnp.float32)
        dec = (
            intercept[None, None, :]
            + combine(lookup_c2(m1, ijk[..., 1]), scales[0])
            + combine(lookup_c2(m2, ijk[..., 0]), scales[1])
            + combine(r3, scales[2])
        )
        proba = calibrated_from_decision(dec.reshape(B * T, C), calib)
        proba = proba.reshape(B, T, C)
        best = jnp.argmax(proba, axis=-1).astype(jnp.int32)
        best_p = jnp.max(proba, axis=-1)
        pred = jnp.where(best_p >= 0.7, best, -1)
        pred = jnp.where(target_valid, pred, -1)
        return pred, best_p, proba

    w_px = build_onepass_weights(quant, dims, pad_x=True)

    @jax.jit
    def fused_sel3(cube_k, target_xyz, target_valid):
        """Tail variant: ALL three lookups folded into the kernel.

        The kernel's only HBM outputs are three (C2·Tp, B) selected
        blocks; the XLA tail is dequant + calibration on scalars.
        Costs +45% w2 rows (pad_x) and the w3r/one-hot operands."""
        B, T = target_xyz.shape[:2]
        ijk = idx_fn(target_xyz).astype(jnp.int32)
        s1, s2, s3 = onepass_scores_i8(cube_k, w_px, ijk, target_valid)

        def r(s):
            return s[:, :T, :].transpose(2, 1, 0).astype(jnp.float32)

        dec = (
            intercept[None, None, :]
            + combine(r(s1), scales[0])
            + combine(r(s2), scales[1])
            + combine(r(s3), scales[2])
        )
        proba = calibrated_from_decision(dec.reshape(B * T, C), calib)
        proba = proba.reshape(B, T, C)
        best = jnp.argmax(proba, axis=-1).astype(jnp.int32)
        best_p = jnp.max(proba, axis=-1)
        pred = jnp.where(best_p >= 0.7, best, -1)
        pred = jnp.where(target_valid, pred, -1)
        return pred, best_p, proba

    # warmup + agreement check
    pf, bf, prf = fast(cubes_i8, xyz, valid)
    pk, bk, prk = fused(cube_k, xyz, valid)
    pg, _, prg = fused_gather(cube_k, xyz, valid)
    ps, _, prs = fused_sel(cube_k, xyz, valid)
    p3s, _, _ = fused_sel3(cube_k, xyz, valid)
    assert np.array_equal(np.asarray(pk), np.asarray(pg))
    sel_err = float(np.max(np.abs(np.asarray(prs) - np.asarray(prk))))
    assert np.array_equal(np.asarray(pk), np.asarray(ps)), sel_err
    assert np.array_equal(np.asarray(pk), np.asarray(p3s))
    agree = float(np.mean(np.asarray(pf) == np.asarray(pk)))
    derr = float(np.max(np.abs(np.asarray(prf) - np.asarray(prk))))

    r_fast = BATCH / slope(lambda: fast(cubes_i8, xyz, valid),
                           lambda o: jax.device_get(o[0][:1]))
    r_fused = BATCH / slope(lambda: fused(cube_k, xyz, valid),
                            lambda o: jax.device_get(o[0][:1]))
    r_gather = BATCH / slope(lambda: fused_gather(cube_k, xyz, valid),
                             lambda o: jax.device_get(o[0][:1]))
    r_sel = BATCH / slope(lambda: fused_sel(cube_k, xyz, valid),
                          lambda o: jax.device_get(o[0][:1]))
    r_sel3 = BATCH / slope(lambda: fused_sel3(cube_k, xyz, valid),
                           lambda o: jax.device_get(o[0][:1]))
    tab = jax.jit(lambda ck: onepass_tables_i8(ck, w))
    _ = jax.device_get(tab(cube_k)[0][:1])
    r_tab = BATCH / slope(lambda: tab(cube_k),
                          lambda o: jax.device_get(o[0][:1, :1]))

    print(json.dumps({
        "scans_per_sec_fast_i8": round(r_fast, 1),
        "scans_per_sec_fused": round(r_fused, 1),
        "scans_per_sec_fused_gather_tail": round(r_gather, 1),
        "scans_per_sec_fused_sel_tail": round(r_sel, 1),
        "scans_per_sec_fused_sel3_tail": round(r_sel3, 1),
        "scans_per_sec_fused_tables_only": round(r_tab, 1),
        "fused_over_fast": round(r_fused / r_fast, 3),
        "pred_agreement": agree,
        "max_proba_diff": derr,
        "batch": BATCH,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
