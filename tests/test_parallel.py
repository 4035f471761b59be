"""Mesh + data-parallel training on the simulated 8-device CPU platform."""

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
