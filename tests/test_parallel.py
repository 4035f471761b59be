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
