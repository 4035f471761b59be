"""Linear model: sklearn scoring/calibration parity + SGD training quality."""

import numpy as np
import pytest
from sklearn import calibration as sk_calibration
from sklearn import linear_model as sk_linear

from radarml_tpu.data.synthetic import make_dataset
from radarml_tpu.data.labels import LabelEncoder
from radarml_tpu.ops.features import process_samples
from radarml_tpu.models.linear import (
    LinearModel,
    SGDConfig,
    calibrate_ovr,
    decision_function,
    fit_sigmoid_calibration,
    from_sklearn_calibrated,
    from_sklearn_linear,
    predict,
    predict_proba_calibrated,
    predict_proba_log_loss,
    sgd_fit,
    sgd_model,
)
import jax.numpy as jnp


@pytest.fixture(scope="module")
def featurized():
    samples, labels = make_dataset(120, seed=3)
    le, y = LabelEncoder.fit_transform(labels)
    X = process_samples(samples, scale=True).astype(np.float32)
    return X, y, le


def _fit_sklearn_sgd(X, y):
    clf = sk_linear.SGDClassifier(
        loss="log_loss", alpha=1e-5, max_iter=200, random_state=1234
    )
    clf.fit(X, y)
    return clf


def test_decision_function_matches_sklearn(featurized):
    X, y, _ = featurized
    clf = _fit_sklearn_sgd(X, y)
    model = from_sklearn_linear(clf)
    got = np.asarray(decision_function(model, jnp.asarray(X)))
    want = clf.decision_function(X)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_predict_proba_matches_sklearn(featurized):
    X, y, _ = featurized
    clf = _fit_sklearn_sgd(X, y)
    model = from_sklearn_linear(clf)
    got = np.asarray(predict_proba_log_loss(model, jnp.asarray(X)))
    want = clf.predict_proba(X)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(predict(model, jnp.asarray(X))), clf.predict(X)
    )


def test_calibrated_proba_matches_sklearn(featurized):
    X, y, _ = featurized
    n = X.shape[0]
    Xf, yf = X[: n // 2], y[: n // 2]
    Xc, yc = X[n // 2 :], y[n // 2 :]
    clf = _fit_sklearn_sgd(Xf, yf)
    # sklearn >= 1.6 spells the reference's cv='prefit' (train.py:723) as
    # a FrozenEstimator-wrapped calibration.
    from sklearn.frozen import FrozenEstimator

    cal = sk_calibration.CalibratedClassifierCV(
        FrozenEstimator(clf), method="sigmoid"
    )
    cal.fit(Xc, yc)
    model, calib = from_sklearn_calibrated(cal)
    got = np.asarray(predict_proba_calibrated(model, calib, jnp.asarray(X)))
    want = cal.predict_proba(X)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_own_sigmoid_calibration_close_to_sklearn(featurized):
    X, y, _ = featurized
    clf = _fit_sklearn_sgd(X, y)
    model = from_sklearn_linear(clf)
    df = clf.decision_function(X)
    # our Platt fit vs sklearn's on the same column
    from sklearn.calibration import _SigmoidCalibration

    for k in range(df.shape[1]):
        y_bin = (y == k).astype(float)
        a, b = fit_sigmoid_calibration(df[:, k], y_bin)
        sk = _SigmoidCalibration().fit(df[:, k], y_bin)
        np.testing.assert_allclose(a, sk.a_, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(b, sk.b_, rtol=1e-3, atol=1e-4)


def test_calibrate_ovr_end_to_end(featurized):
    X, y, _ = featurized
    clf = _fit_sklearn_sgd(X, y)
    model = from_sklearn_linear(clf)
    calib = calibrate_ovr(model, X, y)
    proba = np.asarray(predict_proba_calibrated(model, calib, jnp.asarray(X)))
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-5)
    acc = float((proba.argmax(1) == y).mean())
    assert acc > 0.9


@pytest.mark.parametrize("penalty", ["l2", "l1", "elasticnet"])
def test_sgd_fit_learns(featurized, penalty):
    X, y, le = featurized
    cfg = SGDConfig(alpha=1e-5, penalty=penalty, max_iter=50)
    state = sgd_fit(X[:100], y[:100], n_classes=len(le.classes_), cfg=cfg, epochs=30)
    model = sgd_model(state, cfg)
    acc = float(
        (np.asarray(predict(model, jnp.asarray(X[100:]))) == y[100:]).mean()
    )
    # 20-sample test split: 0.75 = 15/20 correct; small-sample noise
    # between penalties is expected.
    assert acc >= 0.75, acc


def test_sgd_accuracy_comparable_to_sklearn(featurized):
    X, y, le = featurized
    ours_cfg = SGDConfig(alpha=1e-5, penalty="l2")
    state = sgd_fit(X[:100], y[:100], n_classes=3, cfg=ours_cfg, epochs=40)
    model = sgd_model(state, ours_cfg)
    ours = float((np.asarray(predict(model, jnp.asarray(X[100:]))) == y[100:]).mean())
    sk = sk_linear.SGDClassifier(loss="log_loss", alpha=1e-5, random_state=0)
    sk.fit(X[:100], y[:100])
    theirs = float((sk.predict(X[100:]) == y[100:]).mean())
    assert ours >= theirs - 0.1, (ours, theirs)


def test_sgd_partial_fit_continues(featurized):
    X, y, le = featurized
    cfg = SGDConfig(alpha=1e-5)
    state = sgd_fit(X[:60], y[:60], n_classes=3, cfg=cfg, epochs=20)
    state2 = sgd_fit(X[60:100], y[60:100], n_classes=3, cfg=cfg, epochs=20, state=state)
    model = sgd_model(state2, cfg)
    acc = float((np.asarray(predict(model, jnp.asarray(X[100:]))) == y[100:]).mean())
    acc_first = float(
        (np.asarray(predict(sgd_model(state, cfg), jnp.asarray(X[100:]))) == y[100:]).mean()
    )
    # Continued training must not regress materially and should be decent.
    assert acc > 0.65, (acc, acc_first)


def test_sgd_fit_many_early_stop_freezes_converged(rng):
    """With tol set, an easy problem stops well before max epochs and
    matches sklearn's stopping contract (no-improve streak of 5)."""
    import jax.numpy as jnp

    from radarml_tpu.models.linear import sgd_fit_many, sgd_fit, SGDConfig

    n, F, k = 60, 12, 3
    y = (np.arange(n) % k).astype(np.int64)
    centers = rng.normal(size=(k, F)).astype(np.float32) * 3
    X = centers[y] + rng.normal(size=(n, F)).astype(np.float32)

    stopped = sgd_fit_many(
        X, y, k, "l2", False, [1e-4, 1e-2], [0.0, 0.0],
        epochs=200, seed=0, tol=1e-3,
    )
    full = sgd_fit_many(
        X, y, k, "l2", False, [1e-4, 1e-2], [0.0, 0.0],
        epochs=200, seed=0, tol=None,
    )
    # Early stop consumed fewer steps (t counts samples seen).
    assert float(stopped.t[0]) < float(full.t[0])
    # And the stopped model still classifies the easy data correctly.
    pred = np.argmax(
        X @ np.asarray(stopped.coef[0]).T + np.asarray(stopped.intercept[0]),
        axis=1,
    )
    assert (pred == y).mean() > 0.95
