"""End-to-end serving parity with reference-trained sklearn artifacts.

The north-star check (BASELINE.md): a model trained and pickled by the
reference pipeline (SGDClassifier(loss='log') wrapped in
CalibratedClassifierCV(cv='prefit'), plus an sklearn LabelEncoder)
must load into this framework and produce bit-matched predictions and
matching probabilities on the same scans.
"""

import pickle

import numpy as np
import pytest
from sklearn import calibration, linear_model, preprocessing

from radarml_tpu.apps.common_cli import load_label_encoder, load_model
from radarml_tpu.core.arena import DEFAULT_ARENA
from radarml_tpu.data.synthetic import make_dataset, make_scan_batch
from radarml_tpu.models.pipeline import RadarPredictor, pad_targets
from radarml_tpu.ops.features import process_samples


@pytest.fixture(scope="module")
def reference_artifacts(tmp_path_factory):
    """Train an sklearn pipeline exactly as the reference does and
    pickle it in the reference's format (train.py:722-737)."""
    d = tmp_path_factory.mktemp("ref")
    samples, labels = make_dataset(120, seed=3)
    le = preprocessing.LabelEncoder()
    y = le.fit_transform(labels)
    X = process_samples(samples, scale=True).astype(np.float64)
    clf = linear_model.SGDClassifier(
        loss="log_loss", max_iter=50, random_state=1234, tol=None
    ).fit(X[:90], y[:90])
    # cv='prefit' (the reference's spelling, train.py:722) became
    # FrozenEstimator in sklearn >= 1.6; both produce the same artifact.
    from sklearn.frozen import FrozenEstimator

    cal = calibration.CalibratedClassifierCV(
        FrozenEstimator(clf), method="sigmoid"
    ).fit(X[90:], y[90:])
    model_path = d / "svm_radar_classifier.pickle"
    le_path = d / "radar_labels.pickle"
    with open(model_path, "wb") as fp:
        fp.write(pickle.dumps(cal))
    with open(le_path, "wb") as fp:
        fp.write(pickle.dumps(le))
    return str(model_path), str(le_path), cal, le, X, y


def test_sklearn_pickles_load_and_bit_match(reference_artifacts):
    model_path, le_path, cal, le, X, y = reference_artifacts
    model, calib = load_model(model_path)
    loaded_le = load_label_encoder(le_path)
    assert list(loaded_le.classes_) == [str(c) for c in le.classes_]

    from radarml_tpu.models.linear import predict_proba_calibrated

    want = cal.predict_proba(X)
    got = np.asarray(
        predict_proba_calibrated(model, calib, X.astype(np.float32))
    )
    np.testing.assert_allclose(got, want, atol=2e-6)
    np.testing.assert_array_equal(got.argmax(1), want.argmax(1))


def test_reference_model_through_predict_pipeline(reference_artifacts):
    """Full scan→prediction path with the loaded reference model equals
    sklearn evaluated on the reference's own preprocessing math."""
    model_path, _, cal, le, _, _ = reference_artifacts
    model, calib = load_model(model_path)
    predictor = RadarPredictor(
        train_arena=DEFAULT_ARENA, scan_arena=DEFAULT_ARENA,
        model=model, calibration=calib, min_proba=0.0,
    )
    cubes, targets = make_scan_batch(6, seed=9)
    xyz, valid = pad_targets([[(t.x, t.y, t.z)] for t in targets], 1)
    pred, best_p, proba = predictor(cubes, xyz, valid)

    # Oracle: slice + scipy-parity features on the host, sklearn scores.
    import scipy  # noqa: F401  (documents the oracle dependency)

    rows = []
    for b, t in enumerate(targets):
        ijk = DEFAULT_ARENA.clamped_matrix_indices(t.x, t.y, t.z)
        i, j, k = (int(v) for v in ijk)
        cube = np.asarray(cubes[b])
        rows.append((cube[:, j, :], cube[i, :, :], cube[:, :, k]))
    F = process_samples(rows, scale=True)
    want = cal.predict_proba(np.asarray(F, np.float64))
    got = np.asarray(proba)[:, 0, :]
    np.testing.assert_allclose(got, want, atol=5e-5)
    np.testing.assert_array_equal(got.argmax(1), want.argmax(1))
