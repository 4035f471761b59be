"""Microbenchmark: formulations of the whole-cube template contraction.

The serving fast path's cost is three contractions of every scan cube
against tiny per-class templates (models/pipeline.py _build_folded;
replaces reference predict.py:72-131 per-target scoring). This probe
measures candidate device formulations of ONE batch worth of that work
to find the fastest ingest dtype/arithmetic on real hardware:

  f32_cast_u8   u8 cubes cast to f32 in-program (round-2 shipping path)
  f32_cast_bf16 bf16 cubes cast to f32 in-program
  int8_mxu      i8 cubes x i8 templates -> s32 (preferred_element_type),
                the MXU-native int path
  u8_xor_int8   u8 cubes, xor-0x80 reinterpret to i8 inside the program
                (tests whether XLA fuses the convert into the dot)
  sum_u8        plain per-cube reduction: the "speed of light" for any
                program that must read every u8 voxel once
  sum_f32_of_u8 same reduction but through an f32 cast (isolates the
                VPU-cast cost from the contraction structure)

Timing is the repo's slope methodology (bench.py): K_lo/K_hi chained
dispatches with a forced tiny fetch; fixed per-dispatch overhead (the
dev tunnel's ~28 ms) cancels.

Run: python benchmarks/contraction_probe.py  (repo root, real TPU)
Prints one JSON line per formulation plus a summary line.
"""

import json
import os
import sys

import numpy as np

BATCH = 2048
GRID = (22, 31, 176)  # default arena (core/arena.py)
C = 3


# Runnable as `python benchmarks/contraction_probe.py` from anywhere.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools  # noqa: E402

from radarml_tpu.utils.slopetime import slope_time as _slope_time  # noqa: E402

slope_time = functools.partial(_slope_time, k_hi=10)


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

    rng = np.random.default_rng(0)
    cubes_u8 = rng.integers(0, 256, size=(BATCH,) + GRID, dtype=np.uint8)
    X, Y, Z = GRID
    t_xz = (rng.standard_normal((C, X, Z)) * 0.01).astype(np.float32)
    t_yz = (rng.standard_normal((C, Y, Z)) * 0.01).astype(np.float32)
    t_xy = (rng.standard_normal((C, X, Y)) * 0.01).astype(np.float32)

    def quant(t):
        s = np.abs(t).max(axis=(1, 2), keepdims=True) / 127.0
        return np.rint(t / s).astype(np.int8), s.astype(np.float32)

    q_xz, s_xz = quant(t_xz)
    q_yz, s_yz = quant(t_yz)
    q_xy, s_xy = quant(t_xy)

    d = {}
    d["u8"] = jax.device_put(cubes_u8)
    d["i8"] = jax.device_put((cubes_u8.astype(np.int16) - 128).astype(np.int8))
    d["bf16"] = jax.device_put(jnp.asarray(cubes_u8, jnp.bfloat16))
    ts = [jax.device_put(jnp.asarray(t)) for t in (t_xz, t_yz, t_xy)]
    qs = [jax.device_put(jnp.asarray(q)) for q in (q_xz, q_yz, q_xy)]
    hi = jax.lax.Precision.HIGHEST

    @jax.jit
    def tables_f32(cubes):
        c = cubes.astype(jnp.float32)
        m1 = jnp.einsum("cxz,bxyz->bcy", ts[0], c, precision=hi)
        m2 = jnp.einsum("cyz,bxyz->bcx", ts[1], c, precision=hi)
        m3 = jnp.einsum("cxy,bxyz->bcz", ts[2], c, precision=hi)
        return m1, m2, m3

    @jax.jit
    def tables_i8(cubes):
        m1 = jnp.einsum("cxz,bxyz->bcy", qs[0], cubes,
                        preferred_element_type=jnp.int32)
        m2 = jnp.einsum("cyz,bxyz->bcx", qs[1], cubes,
                        preferred_element_type=jnp.int32)
        m3 = jnp.einsum("cxy,bxyz->bcz", qs[2], cubes,
                        preferred_element_type=jnp.int32)
        return (m1 * jnp.asarray(s_xz[:, 0, 0])[:, None],
                m2 * jnp.asarray(s_yz[:, 0, 0])[:, None],
                m3 * jnp.asarray(s_xy[:, 0, 0])[:, None])

    @jax.jit
    def tables_u8_xor(cubes):
        i8 = jax.lax.bitcast_convert_type(cubes ^ np.uint8(0x80), jnp.int8)
        return tables_i8(i8)

    # hi/lo error-compensated templates: N=2C columns per dot (the
    # shipping fast_i8 layout) — measures whether the compensation
    # columns cost MXU time vs single-level N=C.
    q2s = [jax.device_put(jnp.asarray(np.concatenate([q, q]))) for q in
           (q_xz, q_yz, q_xy)]

    @jax.jit
    def tables_i8_n6(cubes):
        m1 = jnp.einsum("cxz,bxyz->bcy", q2s[0], cubes,
                        preferred_element_type=jnp.int32)
        m2 = jnp.einsum("cyz,bxyz->bcx", q2s[1], cubes,
                        preferred_element_type=jnp.int32)
        m3 = jnp.einsum("cxy,bxyz->bcz", q2s[2], cubes,
                        preferred_element_type=jnp.int32)
        return m1, m2, m3

    # hybrid: two tables as f32 VPU reductions sharing ONE i8 read,
    # third as an s8 MXU dot (second read) — probes VPU/MXU overlap.
    @jax.jit
    def tables_hybrid(cubes):
        c = cubes.astype(jnp.float32)
        m1 = jnp.einsum("cxz,bxyz->bcy", ts[0], c, precision=hi)
        m2 = jnp.einsum("cyz,bxyz->bcx", ts[1], c, precision=hi)
        m3 = jnp.einsum("cxy,bxyz->bcz", qs[2], cubes,
                        preferred_element_type=jnp.int32)
        return m1, m2, m3 * jnp.asarray(s_xy[:, 0, 0])[:, None]

    # Full scoring program (tables + per-target table reads +
    # intercept/sigmoid/argmax) with the two lookup strategies, to
    # locate the post-table overhead seen in the full pipeline.
    T = 4
    rngl = np.random.default_rng(5)
    ijk_l = np.stack(
        [rngl.integers(0, s, size=(BATCH, T)) for s in GRID], axis=-1
    ).astype(np.int32)
    ijk_ld = jax.device_put(jnp.asarray(ijk_l))
    intercept = jax.device_put(jnp.zeros((C,), jnp.float32))

    def finish(dec):
        proba = jax.nn.sigmoid(dec)
        proba = proba / jnp.sum(proba, axis=-1, keepdims=True)
        best = jnp.argmax(proba, axis=-1).astype(jnp.int32)
        return jnp.where(jnp.max(proba, -1) >= 0.5, best, -1)

    @jax.jit
    def full_i8_gather(cubes, ijk):
        m1, m2, m3 = tables_i8_n6(cubes)
        m1 = (m1[:, :C] + m1[:, C:]).astype(jnp.float32)
        m2 = (m2[:, :C] + m2[:, C:]).astype(jnp.float32)
        m3 = (m3[:, :C] + m3[:, C:]).astype(jnp.float32)
        dec = intercept[None, None]
        dec = dec + jnp.take_along_axis(
            m1[:, None], ijk[..., 1][:, :, None, None], axis=3)[..., 0]
        dec = dec + jnp.take_along_axis(
            m2[:, None], ijk[..., 0][:, :, None, None], axis=3)[..., 0]
        dec = dec + jnp.take_along_axis(
            m3[:, None], ijk[..., 2][:, :, None, None], axis=3)[..., 0]
        return finish(dec)

    @jax.jit
    def full_i8_onehot(cubes, ijk):
        m1, m2, m3 = tables_i8_n6(cubes)
        m1 = (m1[:, :C] + m1[:, C:]).astype(jnp.float32)
        m2 = (m2[:, :C] + m2[:, C:]).astype(jnp.float32)
        m3 = (m3[:, :C] + m3[:, C:]).astype(jnp.float32)
        o1 = jax.nn.one_hot(ijk[..., 1], GRID[1], dtype=jnp.float32)
        o2 = jax.nn.one_hot(ijk[..., 0], GRID[0], dtype=jnp.float32)
        o3 = jax.nn.one_hot(ijk[..., 2], GRID[2], dtype=jnp.float32)
        dec = intercept[None, None]
        dec = dec + jnp.einsum("bcy,bty->btc", m1, o1)
        dec = dec + jnp.einsum("bcx,btx->btc", m2, o2)
        dec = dec + jnp.einsum("bcz,btz->btc", m3, o3)
        return finish(dec)

    @jax.jit
    def sum_u8(cubes):
        return jnp.sum(cubes.astype(jnp.int32), axis=(1, 2, 3))

    @jax.jit
    def sum_f32(cubes):
        return jnp.sum(cubes.astype(jnp.float32), axis=(1, 2, 3))

    # --- per-target plane gather + template dot ------------------------
    # Tables score every possible index, but a scan carries only
    # T=4 target slots: gathering the 3 planes each target actually
    # needs reads ~40 KB/scan instead of the 120 KB cube — below the
    # whole-cube roofline entirely. (take_along_axis with broadcast
    # size-1 dims; contiguous-z granularity for xz/yz planes.)
    T = 4
    ijk = np.stack(
        [rng.integers(0, s, size=(BATCH, T)) for s in GRID], axis=-1
    ).astype(np.int32)
    ijk_d = jax.device_put(jnp.asarray(ijk))

    def gather_planes(cubes, ijk):
        i = ijk[..., 0][:, :, None, None, None]
        j = ijk[..., 1][:, :, None, None, None]
        k = ijk[..., 2][:, :, None, None, None]
        # (B,1,X,Y,Z) indexed along one axis with (B,T,1,1,1) indices.
        yz_rows = jnp.take_along_axis(cubes[:, None], i, axis=2)[:, :, 0]
        xz_rows = jnp.take_along_axis(cubes[:, None], j, axis=3)[:, :, :, 0]
        xy_rows = jnp.take_along_axis(cubes[:, None], k, axis=4)[..., 0]
        return xz_rows, yz_rows, xy_rows  # (B,T,X,Z),(B,T,Y,Z),(B,T,X,Y)

    @jax.jit
    def slice_dot_f32(cubes, ijk):
        xz_r, yz_r, xy_r = gather_planes(cubes, ijk)
        dec = jnp.einsum("btxz,cxz->btc", xz_r.astype(jnp.float32), ts[0],
                         precision=hi)
        dec += jnp.einsum("btyz,cyz->btc", yz_r.astype(jnp.float32), ts[1],
                          precision=hi)
        dec += jnp.einsum("btxy,cxy->btc", xy_r.astype(jnp.float32), ts[2],
                          precision=hi)
        return dec

    @jax.jit
    def slice_dot_i8(cubes, ijk):
        xz_r, yz_r, xy_r = gather_planes(cubes, ijk)
        d1 = jnp.einsum("btxz,cxz->btc", xz_r, qs[0],
                        preferred_element_type=jnp.int32)
        d2 = jnp.einsum("btyz,cyz->btc", yz_r, qs[1],
                        preferred_element_type=jnp.int32)
        d3 = jnp.einsum("btxy,cxy->btc", xy_r, qs[2],
                        preferred_element_type=jnp.int32)
        return (d1 * jnp.asarray(s_xz[:, 0, 0]) +
                d2 * jnp.asarray(s_yz[:, 0, 0]) +
                d3 * jnp.asarray(s_xy[:, 0, 0]))

    cases = {
        "f32_cast_u8": (tables_f32, "u8"),
        "f32_cast_bf16": (tables_f32, "bf16"),
        "int8_mxu": (tables_i8, "i8"),
        "int8_mxu_n6": (tables_i8_n6, "i8"),
        "full_i8_gather": (lambda c: full_i8_gather(c, ijk_ld), "i8"),
        "full_i8_onehot": (lambda c: full_i8_onehot(c, ijk_ld), "i8"),
        "hybrid_2vpu_1mxu": (tables_hybrid, "i8"),
        "u8_xor_int8": (tables_u8_xor, "u8"),
        "sum_u8": (sum_u8, "u8"),
        "sum_f32_of_u8": (sum_f32, "u8"),
        "slice_dot_u8": (lambda c: slice_dot_f32(c, ijk_d), "u8"),
        "slice_dot_i8": (lambda c: slice_dot_i8(c, ijk_d), "i8"),
    }

    n_bytes = int(np.prod((BATCH,) + GRID))
    results = {}
    for name, (fn, key) in cases.items():
        arr = d[key]
        try:
            out = fn(arr)
            leaf = out[0] if isinstance(out, tuple) else out
            _ = jax.device_get(np.asarray(leaf)[:1])
        except Exception as e:
            print(json.dumps({"case": name, "error": f"{type(e).__name__}: {e}"[:200]}))
            continue
        sec = slope_time(
            lambda fn=fn, arr=arr: fn(arr),
            lambda out: jax.device_get(
                (out[0] if isinstance(out, tuple) else out)[:1]
            ),
        )
        elem_bytes = {"u8": 1, "i8": 1, "bf16": 2}[key]
        gbps = n_bytes * elem_bytes / sec / 1e9
        scans = BATCH / sec
        results[name] = {"scans_per_sec": round(scans, 1),
                         "stream_GBps": round(gbps, 1)}
        print(json.dumps({"case": name, **results[name]}))

    print(json.dumps({"summary": results, "batch": BATCH, "grid": GRID,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
