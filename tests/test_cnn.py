"""Multi-view CNN family: architecture, loss semantics, training loop."""

import numpy as np
import jax
import jax.numpy as jnp

from radarml_tpu.models.cnn import MultiViewCNN, RESCALE
from radarml_tpu.train.trainer import TrainConfig, train_cnn, weighted_xent_loss


def _init(n_classes=3, rescale=(16, 16)):
    model = MultiViewCNN(n_classes=n_classes)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + rescale + (3,), jnp.float32),
        train=False,
    )["params"]
    return model, params


def test_architecture_shapes_and_param_structure():
    model, params = _init(rescale=RESCALE)
    x = jnp.zeros((2,) + RESCALE + (3,), jnp.float32)
    logits = model.apply({"params": params}, x, train=False)
    assert logits.shape == (2, 3)
    # three independent conv branches (dnn.py:45-52: each projection
    # gets its own 64→32 filter banks)
    names = set(params.keys())
    branches = [
        n for n in names if n in ("branch_xz", "branch_yz", "branch_xy")
    ]
    assert len(branches) == 3
    for b in branches:
        kernels = params[b]
        conv_feats = sorted(
            v["kernel"].shape[-1] for v in kernels.values()
        )
        assert conv_feats == [32, 64]


def test_weighted_loss_matches_keras_semantics():
    logits = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    y = jnp.asarray([0, 1])
    w = jnp.asarray([2.0, 1.0, 1.0])
    got = float(weighted_xent_loss(logits, y, w))
    nll = -np.log(np.exp(2.0) / (np.exp(2.0) + 2.0))
    want = (2.0 * nll + 1.0 * nll) / 3.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_train_cnn_learns_separable_data():
    rng = np.random.default_rng(0)
    rescale = (16, 16)
    n = 48
    y = (np.arange(n) % 3).astype(np.int64)
    X = rng.normal(size=(n,) + rescale + (3,)).astype(np.float32) * 0.1
    # class-dependent mean shift makes the task separable
    for c in range(3):
        X[y == c, :, :, c] += 1.0
    model, params = _init(rescale=rescale)
    cfg = TrainConfig(batch_size=16, epochs=15, patience=5)
    best, history = train_cnn(
        model, params, X[:36], y[:36], X[36:], y[36:], config=cfg
    )
    assert max(history["val_accuracy"]) > 0.6
    assert len(history["loss"]) <= cfg.epochs
    # best params reproduce the best recorded val accuracy
    logits = model.apply({"params": best}, jnp.asarray(X[36:]), train=False)
    acc = float((np.asarray(logits).argmax(1) == y[36:]).mean())
    np.testing.assert_allclose(acc, max(history["val_accuracy"]), atol=1e-6)


def test_early_stopping_triggers():
    rng = np.random.default_rng(1)
    rescale = (16, 16)
    X = rng.normal(size=(12,) + rescale + (3,)).astype(np.float32)
    y = rng.integers(0, 3, size=12).astype(np.int64)  # unlearnable noise
    model, params = _init(rescale=rescale)
    cfg = TrainConfig(batch_size=6, epochs=100, patience=3)
    _, history = train_cnn(model, params, X, y, X, y, config=cfg)
    assert len(history["loss"]) < 100


def test_train_cnn_mesh_matches_single_device():
    """DP-sharded training is the same math: replicated params, sharded
    batch, XLA-inserted gradient reduction — history matches the
    single-device run."""
    from radarml_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    rescale = (16, 16)
    n = 32
    X = rng.normal(size=(n,) + rescale + (3,)).astype(np.float32)
    y = (np.arange(n) % 3).astype(np.int64)
    model, params = _init(rescale=rescale)
    cfg = TrainConfig(batch_size=8, epochs=3, patience=10)
    _, hist_single = train_cnn(model, params, X, y, X[:8], y[:8], config=cfg)
    _, hist_mesh = train_cnn(
        model, params, X, y, X[:8], y[:8], config=cfg, mesh=make_mesh(8)
    )
    np.testing.assert_allclose(
        hist_mesh["loss"], hist_single["loss"], rtol=1e-4
    )
    np.testing.assert_allclose(
        hist_mesh["val_loss"], hist_single["val_loss"], rtol=1e-4
    )


def test_train_cnn_dataset_smaller_than_batch():
    """A captured dataset below --batch_size trains as one full batch
    instead of raising at trace time (default dnn batch is 64)."""
    rng = np.random.default_rng(2)
    rescale = (16, 16)
    n = 9
    X = rng.normal(size=(n,) + rescale + (3,)).astype(np.float32)
    y = (np.arange(n) % 3).astype(np.int64)
    model, params = _init(rescale=rescale)
    cfg = TrainConfig(batch_size=64, epochs=2, patience=5)
    _, history = train_cnn(model, params, X, y, X, y, config=cfg)
    assert len(history["loss"]) == 2
    assert np.isfinite(history["loss"]).all()


def test_patience_zero_trains_and_stops_at_first_plateau():
    """patience<=0 must behave like the host-loop era: train, stopping
    at the first non-improving epoch — not run zero epochs."""
    rng = np.random.default_rng(6)
    X = rng.normal(size=(24, 8, 8, 3)).astype(np.float32)
    y = rng.integers(0, 3, size=(24,)).astype(np.int32)
    model = MultiViewCNN(n_classes=3)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 8, 8, 3), np.float32),
        train=False,
    )["params"]
    cfg = TrainConfig(batch_size=8, epochs=50, patience=0)
    best, history = train_cnn(model, params, X, y, X, y, config=cfg)
    assert 1 <= len(history["loss"]) <= 50


def test_checkpoint_kill_and_resume_reproduces_uninterrupted_run(tmp_path):
    """A run checkpointed mid-training and resumed reproduces the
    uninterrupted run's best params and history exactly (the
    reference's ModelCheckpoint durability, dnn.py:365-370, plus true
    resume which Keras lacks)."""
    rng = np.random.default_rng(3)
    rescale = (16, 16)
    n = 36
    y = (np.arange(n) % 3).astype(np.int64)
    X = rng.normal(size=(n,) + rescale + (3,)).astype(np.float32) * 0.1
    for c in range(3):
        X[y == c, :, :, c] += 1.0
    Xv, yv = X[:12], y[:12]
    model, params = _init(rescale=rescale)
    cfg = TrainConfig(batch_size=12, epochs=12, patience=50)

    best_full, hist_full = train_cnn(
        model, params, X, y, Xv, yv, config=cfg
    )

    # "Crash" at epoch 8: run only 8 epochs with checkpoints...
    ckpt = str(tmp_path / "cnn_ckpt")
    cfg8 = TrainConfig(batch_size=12, epochs=8, patience=50)
    train_cnn(
        model, params, X, y, Xv, yv, config=cfg8,
        checkpoint_dir=ckpt, checkpoint_every=4,
    )
    # ...then resume the 12-epoch schedule from the latest checkpoint.
    best_res, hist_res = train_cnn(
        model, params, X, y, Xv, yv, config=cfg,
        checkpoint_dir=ckpt, checkpoint_every=4, resume=True,
    )

    for k in hist_full:
        np.testing.assert_allclose(
            hist_res[k], hist_full[k], rtol=1e-5, atol=1e-6,
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        best_res, best_full,
    )
