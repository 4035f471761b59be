"""Neural-family serving: CNN / SGAN classifiers through RadarPredictor.

The reference can only serve its sklearn SVM pickle
(predict.py:224-227); this framework serves every trained family
through the same pipeline, CLI, and AOT export.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radarml_tpu.core.arena import DEFAULT_ARENA, RADAR_MAX
from radarml_tpu.models.cnn import MultiViewCNN
from radarml_tpu.models.pipeline import (
    NeuralClassifier,
    RadarPredictor,
    pad_targets,
)


@pytest.fixture(scope="module")
def cnn_classifier():
    rescale = (16, 16)
    module = MultiViewCNN(n_classes=3)
    params = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + rescale + (3,), jnp.float32),
        train=False,
    )["params"]

    def apply(views):
        return module.apply({"params": params}, views, train=False)

    return NeuralClassifier(apply=apply, rescale=rescale, n_classes=3)


def test_neural_predictor_matches_training_preprocessing(cnn_classifier):
    """Predictor proba == slice → preprocess.resize path → forward."""
    from radarml_tpu.data.preprocess import resize_views, scale_to_symmetric

    predictor = RadarPredictor(
        train_arena=DEFAULT_ARENA, scan_arena=DEFAULT_ARENA,
        model=cnn_classifier, min_proba=0.0,
    )
    rng = np.random.default_rng(2)
    B, T = 3, 2
    cubes = np.rint(
        rng.random((B,) + DEFAULT_ARENA.grid_shape) * RADAR_MAX
    ).astype(np.float32)
    xyz_list = [
        [(5.0 * t, -4.0 * t, 80.0 + 20 * b + 7 * t) for t in range(T)]
        for b in range(B)
    ]
    xyz, valid = pad_targets(xyz_list, max_targets=T)
    pred, best_p, proba = predictor(cubes, xyz, valid)

    # Oracle: numpy slicing + the exact training preprocessing path.
    arena = DEFAULT_ARENA
    planes = {"xz": [], "yz": [], "xy": []}
    for b in range(B):
        for t in range(T):
            x, y, z = xyz_list[b][t]
            i, j, k = (
                int(np.asarray(v))
                for v in arena.clamped_matrix_indices(
                    jnp.float32(x), jnp.float32(y), jnp.float32(z)
                )
            )
            planes["yz"].append(cubes[b][i, :, :])
            planes["xz"].append(cubes[b][:, j, :])
            planes["xy"].append(cubes[b][:, :, k])
    views = resize_views(
        scale_to_symmetric(np.stack(planes["xz"])),
        scale_to_symmetric(np.stack(planes["yz"])),
        scale_to_symmetric(np.stack(planes["xy"])),
        cnn_classifier.rescale,
    )
    logits = cnn_classifier.apply(jnp.asarray(views))
    expect = np.asarray(jax.nn.softmax(logits, axis=-1)).reshape(B, T, 3)
    np.testing.assert_allclose(np.asarray(proba), expect, atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(pred), expect.argmax(-1).astype(np.int32)
    )


def test_neural_predictor_threshold_and_mask(cnn_classifier):
    from radarml_tpu.models.pipeline import UNKNOWN

    predictor = RadarPredictor(
        train_arena=DEFAULT_ARENA, scan_arena=DEFAULT_ARENA,
        model=cnn_classifier, min_proba=1.1,  # nothing passes
    )
    rng = np.random.default_rng(3)
    cubes = rng.random((2,) + DEFAULT_ARENA.grid_shape).astype(np.float32)
    xyz, valid = pad_targets([[(0.0, 0.0, 100.0)], []], max_targets=2)
    pred, _, _ = predictor(cubes, xyz, valid)
    assert np.all(np.asarray(pred) == UNKNOWN)


def test_cnn_artifact_loads_and_serves(tmp_path, cnn_classifier):
    """dnn-format pickle → load_model → NeuralClassifier → serve CLI."""
    import pickle

    from radarml_tpu.apps import serve as serve_app
    from radarml_tpu.apps.common_cli import (
        load_model,
        save_label_encoder,
    )
    from radarml_tpu.data.labels import LabelEncoder
    from radarml_tpu.models.cnn import MultiViewCNN

    rescale = (16, 16)
    module = MultiViewCNN(n_classes=3)
    params = module.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1,) + rescale + (3,), jnp.float32),
        train=False,
    )["params"]
    path = str(tmp_path / "c_model.pickle")
    with open(path, "wb") as fp:
        pickle.dump(
            {
                "format": "radarml_tpu.v1",
                "kind": "cnn",
                "params": jax.tree.map(np.asarray, params),
                "classes": ["cat", "dog", "person"],
                "rescale": rescale,
            },
            fp,
        )
    model, calib = load_model(path)
    assert type(model).__name__ == "NeuralClassifier"
    assert calib is None

    le_path = str(tmp_path / "le.pickle")
    save_label_encoder(le_path, LabelEncoder(classes_=["cat", "dog", "person"]))
    stats = serve_app.main([
        "--svm_model", path, "--label_encoder", le_path,
        "--duration", "1.5", "--scan_period", "0.05", "--max_batch", "4",
        "--min_proba", "0.0",
    ])
    assert stats["processed"] > 0


def test_sgan_classifier_artifact_loads(tmp_path):
    import pickle

    from radarml_tpu.apps.common_cli import load_model
    from radarml_tpu.models.sgan import Discriminator
    from radarml_tpu.train.sgan_trainer import SGANConfig, sgan_init

    cfg = SGANConfig(n_classes=3)
    gen, disc, state = sgan_init(jax.random.PRNGKey(0), cfg, (16, 16))
    path = str(tmp_path / "c_model.pickle")
    with open(path, "wb") as fp:
        pickle.dump(
            {
                "format": "radarml_tpu.v1",
                "kind": "sgan_classifier",
                "d_params": jax.tree.map(np.asarray, state.d_params),
                "d_stats": jax.tree.map(np.asarray, state.d_stats),
                "classes": ["cat", "dog", "person"],
                "rescale": (16, 16),
            },
            fp,
        )
    model, _ = load_model(path)
    predictor = RadarPredictor(
        train_arena=DEFAULT_ARENA, scan_arena=DEFAULT_ARENA,
        model=model, min_proba=0.0,
    )
    rng = np.random.default_rng(4)
    cubes = rng.random((2,) + DEFAULT_ARENA.grid_shape).astype(np.float32)
    xyz, valid = pad_targets([[(0.0, 0.0, 90.0)], [(3.0, 2.0, 150.0)]], 1)
    pred, best_p, proba = predictor(cubes, xyz, valid)
    assert proba.shape == (2, 1, 3)
    assert np.all(np.isfinite(np.asarray(proba)))


def test_neural_predictor_aot_export_roundtrip(tmp_path, cnn_classifier):
    """The neural serving program exports/reloads like the linear one."""
    from radarml_tpu.serving import export_predictor, load_serving_artifact

    predictor = RadarPredictor(
        train_arena=DEFAULT_ARENA, scan_arena=DEFAULT_ARENA,
        model=cnn_classifier, min_proba=0.0, cube_dtype="bfloat16",
    )
    path = str(tmp_path / "cnn_serving.rmlx")
    export_predictor(predictor, path, max_targets=2)
    art = load_serving_artifact(path)

    rng = np.random.default_rng(5)
    cubes = np.rint(
        rng.random((3,) + DEFAULT_ARENA.grid_shape) * RADAR_MAX
    ).astype(np.float32)
    xyz, valid = pad_targets(
        [[(1.0, 1.0, 90.0)], [(2.0, -2.0, 120.0)], []], max_targets=2
    )
    live = predictor(cubes, xyz, valid)
    aot = art(cubes, xyz, valid)
    np.testing.assert_array_equal(np.asarray(live[0]), np.asarray(aot[0]))
    np.testing.assert_allclose(
        np.asarray(live[2]), np.asarray(aot[2]), atol=1e-6
    )
