"""Grid-search harness: sklearn parity of folds/enumeration + end-to-end."""

import numpy as np
from sklearn import model_selection

from radarml_tpu.train import gridsearch as gs


def test_stratified_kfold_matches_sklearn(rng):
    for n, k, folds in [(37, 3, 5), (60, 2, 5), (24, 4, 3)]:
        y = rng.integers(0, k, size=n)
        if len(np.unique(y)) < k:
            y[:k] = np.arange(k)
        skf = model_selection.StratifiedKFold(n_splits=folds)
        want = list(skf.split(np.zeros((n, 1)), y))
        got = gs.stratified_kfold_indices(y, folds)
        assert len(want) == len(got)
        for (wtr, wte), (gtr, gte) in zip(want, got):
            np.testing.assert_array_equal(wtr, gtr)
            np.testing.assert_array_equal(wte, gte)


def test_stratified_kfold_unsorted_first_appearance(rng):
    # Classes appearing out of order exercise the encoding path.
    y = np.array(["dog", "cat", "dog", "person", "cat", "dog",
                  "person", "cat", "dog", "person", "cat", "dog"])
    skf = model_selection.StratifiedKFold(n_splits=3)
    want = list(skf.split(np.zeros((len(y), 1)), y))
    got = gs.stratified_kfold_indices(y, 3)
    for (wtr, wte), (gtr, gte) in zip(want, got):
        np.testing.assert_array_equal(wtr, gtr)
        np.testing.assert_array_equal(wte, gte)


def test_parameter_grid_matches_sklearn_order():
    grid = [
        {"alpha": [1e-3, 1e-4], "penalty": ["l1", "l2"], "average": [False]},
        {"alpha": [1e-5], "penalty": ["elasticnet"], "l1_ratio": [0.1, 0.2]},
    ]
    want = list(model_selection.ParameterGrid(grid))
    got = gs.parameter_grid(grid)
    assert want == got


def _blobs(rng, n=60, k=3, f=10):
    centers = rng.normal(size=(k, f)) * 3.0
    y = np.arange(n) % k
    X = (centers[y] + rng.normal(size=(n, f))).astype(np.float32)
    return X, y


def test_grid_search_sgd_end_to_end(rng):
    X, y = _blobs(rng)
    small = [{"alpha": [1e-4, 1e-2], "penalty": ["l2"], "average": [False]}]
    res = gs.grid_search_sgd(X, y, folds=3, grid=small, epochs=5)
    assert res.best_score > 0.8
    model, cfg = res.best_model
    from radarml_tpu.models.linear import predict
    acc = (np.asarray(predict(model, X)) == y).mean()
    assert acc > 0.9
    assert len(res.cv_results) == 2
    assert res.best_params["alpha"] in (1e-4, 1e-2)


def test_grid_search_svc_end_to_end(rng):
    X, y = _blobs(rng)
    small = [
        {"C": [1.0], "kernel": ["linear"]},
        {"C": [10.0], "gamma": [0.05], "kernel": ["rbf"]},
    ]
    res = gs.grid_search_svc(X, y, folds=3, grid=small, probability=True)
    assert res.best_score > 0.8
    from radarml_tpu.models import svc as jsvc
    proba = np.asarray(jsvc.predict_proba(res.best_model, X))
    assert proba.shape == (len(y), 3)
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-5)


def test_batched_grid_search_matches_sequential(rng):
    X, y = _blobs(rng, n=45, k=3, f=12)
    grid = [
        {"alpha": [1e-4, 1e-3], "penalty": ["l2"], "average": [False]},
        {"alpha": [1e-4], "penalty": ["elasticnet"], "average": [False],
         "l1_ratio": [0.1, 0.3]},
    ]
    seq = gs.grid_search_sgd(X, y, folds=3, grid=grid, epochs=6,
                             vmap_candidates=False)
    bat = gs.grid_search_sgd(X, y, folds=3, grid=grid, epochs=6,
                             vmap_candidates=True)
    assert bat.best_params == seq.best_params
    for a, b in zip(seq.cv_results, bat.cv_results):
        assert a["params"] == b["params"]
        np.testing.assert_allclose(
            a["mean_test_score"], b["mean_test_score"], atol=1e-6
        )


def test_svc_batched_grid_matches_sequential(rng):
    """Device-batched SVC CV == 150-sequential-fits CV (same QPs)."""
    X, y = _blobs(rng, n=48, k=3, f=12)
    grid = [
        {"C": [0.1, 1.0, 10.0], "kernel": ["linear"]},
        {"C": [1.0, 10.0], "gamma": [0.01, 0.1], "kernel": ["rbf"]},
    ]
    seq = gs.grid_search_svc(X, y, folds=3, grid=grid, probability=False,
                             device_batched=False)
    bat = gs.grid_search_svc(X, y, folds=3, grid=grid, probability=False,
                             device_batched=True)
    assert bat.best_params == seq.best_params
    for a, b in zip(seq.cv_results, bat.cv_results):
        assert a["params"] == b["params"]
        np.testing.assert_allclose(
            a["mean_test_score"], b["mean_test_score"], atol=1e-6
        )


def test_svc_batched_grid_mesh_sharded(rng):
    """Candidate axis sharded over an 8-device mesh: identical scores."""
    from radarml_tpu.parallel.mesh import make_mesh

    X, y = _blobs(rng, n=42, k=3, f=10)
    grid = [
        {"C": [0.1, 1.0, 10.0, 100.0], "kernel": ["linear"]},
        {"C": [1.0, 10.0], "gamma": [0.05], "kernel": ["rbf"]},
    ]
    single = gs.grid_search_svc(X, y, folds=3, grid=grid, probability=False)
    mesh = make_mesh(8)
    sharded = gs.grid_search_svc(X, y, folds=3, grid=grid,
                                 probability=False, mesh=mesh)
    assert sharded.best_params == single.best_params
    for a, b in zip(single.cv_results, sharded.cv_results):
        np.testing.assert_allclose(
            a["mean_test_score"], b["mean_test_score"], atol=1e-6
        )


def test_sgd_grid_mesh_sharded_bit_identical(rng):
    """Fold axis sharded over the 8-device mesh: fold fits are
    independent, so per-candidate CV scores match the single-device
    run bit-for-bit (VERDICT: reference train.py:350-381 semantics)."""
    from radarml_tpu.parallel.mesh import make_mesh

    X, y = _blobs(rng, n=45, k=3, f=12)
    grid = [
        {"alpha": [1e-4, 1e-3], "penalty": ["l2"], "average": [False]},
        {"alpha": [1e-4], "penalty": ["l1"], "average": [False]},
    ]
    single = gs.grid_search_sgd(X, y, folds=3, grid=grid, epochs=6)
    mesh = make_mesh(8)
    sharded = gs.grid_search_sgd(X, y, folds=3, grid=grid, epochs=6,
                                 mesh=mesh)
    assert sharded.best_params == single.best_params
    for a, b in zip(single.cv_results, sharded.cv_results):
        assert a["split_scores"] == b["split_scores"]


def test_svc_batched_grid_resolves_string_gamma(rng):
    """gamma='scale'/'auto' work on the device-batched path and match
    the explicitly-resolved numeric gamma."""
    from radarml_tpu.models.svc import _resolve_gamma

    X, y = _blobs(rng, n=36, k=2, f=8)
    for gamma in ("scale", "auto"):
        g = _resolve_gamma(gamma, X)
        named = gs.grid_search_svc(
            X, y, folds=3, grid=[{"C": [1.0], "gamma": [gamma],
                                  "kernel": ["rbf"]}],
            probability=False, device_batched=True,
        )
        numeric = gs.grid_search_svc(
            X, y, folds=3, grid=[{"C": [1.0], "gamma": [g],
                                  "kernel": ["rbf"]}],
            probability=False, device_batched=True,
        )
        np.testing.assert_allclose(
            named.cv_results[0]["mean_test_score"],
            numeric.cv_results[0]["mean_test_score"], atol=1e-6,
        )


def test_grid_search_sgd_tol_none_disables_early_stop(rng):
    """tol=None (the quality-report recipe, benchmarks/SGD_QUALITY.json)
    must run the FULL epoch budget: it compiles the no-earlystop fused
    program, so its CV scores equal an early-stop run whose tolerance
    can never trigger (tol=-inf) and differ from one that always
    triggers after n_iter_no_change epochs — the underfit that caused
    the round-4 SGD quality inversion (0.844 vs 0.911 with tol=None)."""
    # Overlapping blobs (unit-scale centers): easy sets saturate at
    # the stop point and hide the early-stop's effect on the scores.
    n, k, f = 60, 3, 10
    centers = rng.normal(size=(k, f)) * 1.0
    y = np.arange(n) % k
    X = (centers[y] + rng.normal(size=(n, f))).astype(np.float32)
    grid = [{"alpha": [1e-4, 1e-3], "penalty": ["l2"], "average": [False]}]
    kw = dict(folds=3, grid=grid, epochs=25)
    none = gs.grid_search_sgd(X, y, tol=None, **kw)
    never = gs.grid_search_sgd(X, y, tol=-np.inf, **kw)
    for a, b in zip(none.cv_results, never.cv_results):
        np.testing.assert_allclose(
            a["mean_test_score"], b["mean_test_score"], atol=1e-6
        )
    always = gs.grid_search_sgd(X, y, tol=np.inf, **kw)
    stopped = [
        abs(a["mean_test_score"] - b["mean_test_score"]) > 1e-9
        for a, b in zip(none.cv_results, always.cv_results)
    ]
    assert any(stopped), "tol=inf early stop changed nothing — the stop path is dead"
