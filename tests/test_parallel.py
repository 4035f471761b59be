"""Mesh + data-parallel training on the simulated 8-device CPU platform."""

import os

import jax
import numpy as np
import pytest

from radarml_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from radarml_tpu.parallel.train_step import make_dp_sgd_train_step


def test_simulated_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    mesh2 = make_mesh(8, shape=(4, 2), axis_names=("data", "model"))
    assert mesh2.axis_names == ("data", "model")


def test_dp_train_step_runs_and_learns():
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    n, f, c = 64, 32, 3
    true_w = rng.normal(size=(c, f))
    X = rng.normal(size=(n, f)).astype(np.float32)
    y = (X @ true_w.T).argmax(1).astype(np.int32)

    import jax.numpy as jnp

    params = replicate(
        mesh,
        {
            "coef": jnp.zeros((c, f), dtype=jnp.float32),
            "intercept": jnp.zeros((c,), dtype=jnp.float32),
        },
    )
    Xs, ys = shard_batch(mesh, X, y)
    step = make_dp_sgd_train_step(mesh, n_classes=c, lr=0.5)
    losses = []
    for _ in range(60):
        params, loss = step(params, Xs, ys)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.3


def test_dp_matches_single_device():
    """Sharded and single-device training must agree numerically."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n, f, c = 32, 16, 3
    X = rng.normal(size=(n, f)).astype(np.float32)
    y = rng.integers(0, c, n).astype(np.int32)
    init = {
        "coef": jnp.zeros((c, f), dtype=jnp.float32),
        "intercept": jnp.zeros((c,), dtype=jnp.float32),
    }

    mesh8 = make_mesh(8)
    p8 = replicate(mesh8, init)
    X8, y8 = shard_batch(mesh8, X, y)
    step8 = make_dp_sgd_train_step(mesh8, n_classes=c, lr=0.1)

    mesh1 = make_mesh(1)
    p1 = replicate(mesh1, init)
    step1 = make_dp_sgd_train_step(mesh1, n_classes=c, lr=0.1)

    for _ in range(5):
        p8, l8 = step8(p8, X8, y8)
        p1, l1 = step1(p1, jnp.asarray(X), jnp.asarray(y))
    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p8["coef"]), np.asarray(p1["coef"]), atol=1e-5
    )


def test_graft_dryrun_multichip():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_predictor_shards_over_mesh(rng):
    """Batched predict runs with scans sharded across the 8-device mesh."""
    import jax.numpy as jnp
    import numpy as np

    from radarml_tpu.core.arena import DEFAULT_ARENA
    from radarml_tpu.models.linear import LinearModel, SigmoidCalibration
    from radarml_tpu.models.pipeline import RadarPredictor
    from radarml_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    n_classes, F = 3, DEFAULT_ARENA.feature_length
    model = LinearModel(
        coef=jnp.asarray(rng.normal(size=(n_classes, F)) * 0.01, jnp.float32),
        intercept=jnp.zeros((n_classes,), jnp.float32),
    )
    calib = SigmoidCalibration(
        a=-jnp.ones((n_classes,), jnp.float32),
        b=jnp.zeros((n_classes,), jnp.float32),
    )
    kw = dict(
        train_arena=DEFAULT_ARENA, scan_arena=DEFAULT_ARENA,
        model=model, calibration=calib, min_proba=0.5,
    )
    single = RadarPredictor(mode="fast", **kw)
    sharded = RadarPredictor(mode="fast", mesh=mesh, **kw)

    B, T = 16, 2
    cubes = jnp.asarray(rng.random((B,) + DEFAULT_ARENA.grid_shape) * 255,
                        jnp.float32)
    xyz = jnp.asarray(rng.uniform(-20, 20, size=(B, T, 3)), jnp.float32)
    xyz = xyz.at[..., 2].set(jnp.abs(xyz[..., 2]) + 60.0)
    valid = jnp.ones((B, T), dtype=bool)

    p1, _, proba1 = single(cubes, xyz, valid)
    p2, _, proba2 = sharded(cubes, xyz, valid)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(
        np.asarray(proba1), np.asarray(proba2), atol=1e-6
    )


def test_two_axis_mesh_shape():
    """make_mesh supports explicit (data, model) shapes for future
    model-axis sharding (SURVEY §2.3: API room for TP, unused)."""
    from radarml_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, shape=(4, 2), axis_names=("data", "model"))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


_DCN_DRIVER = r'''
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from radarml_tpu.parallel.mesh import init_distributed, make_mesh, local_to_global, replicate
init_distributed(coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
import numpy as np
import jax.numpy as jnp
from radarml_tpu.parallel.train_step import make_dp_sgd_train_step

rng = np.random.default_rng(0)
X = rng.normal(size=(16, 12)).astype(np.float32)
y = (np.arange(16) % 3).astype(np.int32)
mesh = make_mesh()  # global 8-device mesh spanning both processes
lo = slice(pid * 8, (pid + 1) * 8)
Xg, yg = local_to_global(mesh, X[lo], y[lo])
params = replicate(mesh, {
    "coef": jnp.zeros((3, 12), jnp.float32),
    "intercept": jnp.zeros((3,), jnp.float32),
})
step = make_dp_sgd_train_step(mesh, n_classes=3, lr=0.5)
for _ in range(3):
    params, loss = step(params, Xg, yg)
if pid == 0:
    np.savez(out, coef=np.asarray(params["coef"]),
             intercept=np.asarray(params["intercept"]),
             loss=float(loss))
'''


def test_multiprocess_dcn_dp_step(tmp_path):
    """2 processes x 4 virtual devices: the DP gradient all-reduce
    crosses the process boundary (the DCN seam) and matches the
    single-process 8-device result to reduction-order tolerance."""
    import socket
    import subprocess
    import sys

    import jax.numpy as jnp

    from radarml_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from radarml_tpu.parallel.train_step import make_dp_sgd_train_step

    # Single-process reference on the in-test 8-device mesh.
    rng_ = np.random.default_rng(0)
    X = rng_.normal(size=(16, 12)).astype(np.float32)
    y = (np.arange(16) % 3).astype(np.int32)
    mesh = make_mesh(8)
    Xs, ys = shard_batch(mesh, X, y)
    params = replicate(mesh, {
        "coef": jnp.zeros((3, 12), jnp.float32),
        "intercept": jnp.zeros((3,), jnp.float32),
    })
    step = make_dp_sgd_train_step(mesh, n_classes=3, lr=0.5)
    for _ in range(3):
        params, loss = step(params, Xs, ys)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    driver = tmp_path / "dcn_driver.py"
    driver.write_text(_DCN_DRIVER)
    out = tmp_path / "proc0.npz"
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = [p for p in env.get("PYTHONPATH", "").split(":") if p]
    if repo not in parts:
        parts.append(repo)
    env["PYTHONPATH"] = ":".join(parts)
    procs = [
        subprocess.Popen(
            [sys.executable, str(driver), str(i), str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    for p in procs:
        _, err = p.communicate(timeout=240)
        assert p.returncode == 0, err.decode()[-2000:]

    got = np.load(out)
    # Cross-process psum may associate reductions differently: allow
    # float32 reduction-order noise, nothing more.
    np.testing.assert_allclose(
        got["coef"], np.asarray(params["coef"]), atol=1e-6
    )
    np.testing.assert_allclose(
        got["intercept"], np.asarray(params["intercept"]), atol=1e-6
    )
    assert np.isfinite(got["loss"])
