"""Orbax checkpoint store + SGAN mid-run resume."""

import dataclasses

import jax
import numpy as np
import pytest

from radarml_tpu.train.checkpoint import CheckpointStore
from radarml_tpu.train import sgan_trainer as st


def test_store_round_trip_with_namedtuple_structure(tmp_path):
    import jax.numpy as jnp
    import optax

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    store = CheckpointStore(str(tmp_path), max_to_keep=2)
    store.save(1, {"params": params, "opt": opt}, meta={"note": "first"})
    store.save(5, {"params": params, "opt": opt})
    assert store.latest_step() == 5

    template = {"params": params, "opt": tx.init(params)}
    step, tree, _ = store.restore(template=template)
    assert step == 5
    # optimizer namedtuple structure restored intact → update applies
    grads = jax.tree.map(jnp.ones_like, tree["params"])
    updates, _ = tx.update(grads, tree["opt"], tree["params"])
    new_params = optax.apply_updates(tree["params"], updates)
    assert np.isfinite(np.asarray(new_params["w"])).all()
    np.testing.assert_allclose(
        np.asarray(tree["params"]["w"]), np.arange(6.0).reshape(2, 3)
    )
    store.close()


def test_store_retention(tmp_path):
    store = CheckpointStore(str(tmp_path), max_to_keep=2)
    for s in (1, 2, 3, 4):
        store.save(s, {"x": np.ones(2) * s})
    assert store.latest_step() == 4
    with pytest.raises(Exception):
        store.restore(step=1)  # aged out
    store.close()


def test_sgan_resume_continues_mid_run(tmp_path):
    """Train 1 epoch with checkpoints, then resume: the second call
    restores the saved step and runs only the remainder."""
    small = (16, 16)
    cfg = st.SGANConfig(
        n_classes=3, n_batch=8, n_sup_samples=9, n_epochs=2, seed=0
    )
    gen, disc, state0 = st.sgan_init(jax.random.PRNGKey(0), cfg, rescale=small)
    rng = np.random.default_rng(1)
    n = 16  # bat_per_epo = 2 → 4 total steps, checkpoint every 2
    X = rng.normal(size=(n,) + small + (3,)).astype(np.float32) * 0.5
    y = (np.arange(n) % 3).astype(np.int64)

    ck = str(tmp_path / "ck")
    one_epoch = dataclasses.replace(cfg, n_epochs=1)
    st.train_sgan(
        gen, disc, state0, (X, y, None), (X[:8], y[:8]),
        one_epoch, checkpoint_dir=ck,
    )
    store = CheckpointStore(ck)
    assert store.latest_step() == 2
    store.close()

    seen = []
    st.train_sgan(
        gen, disc, state0, (X, y, None), (X[:8], y[:8]),
        cfg, checkpoint_dir=ck, resume=True,
        on_summary=lambda i, acc, s: seen.append(i),
    )
    # resumed at step 2 → only the step-4 summary fires
    assert seen == [3]
    store = CheckpointStore(ck)
    assert store.latest_step() == 4
    store.close()
