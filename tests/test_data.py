"""Data layer: store roundtrip, label pipeline, balance/split RNG parity."""

import numpy as np
import pytest
from sklearn import model_selection, preprocessing, utils

from radarml_tpu.data.balance import balance_classes
from radarml_tpu.data.labels import (
    LabelEncoder,
    apply_aliases,
    class_weights,
    filter_samples,
)
from radarml_tpu.data.split import train_val_test_split
from radarml_tpu.data.store import load_datasets, save_dataset, stack_samples
from radarml_tpu.data.synthetic import make_dataset, make_scan_batch


def test_store_roundtrip_and_append(tmp_path):
    samples, labels = make_dataset(6, seed=7)
    path = str(tmp_path / "ds.pickle")
    save_dataset(path, samples[:4], labels[:4])
    save_dataset(path, samples[4:], labels[4:])  # append
    data = load_datasets([path])
    assert len(data["samples"]) == 6
    assert data["labels"] == labels
    np.testing.assert_array_equal(data["samples"][5][0], samples[5][0])


def test_label_encoder_matches_sklearn():
    labels = ["dog", "cat", "person", "dog", "cat"]
    le, enc = LabelEncoder.fit_transform(labels)
    sk = preprocessing.LabelEncoder()
    sk_enc = sk.fit_transform(labels)
    assert list(le.classes_) == list(sk.classes_)
    np.testing.assert_array_equal(enc, sk_enc)
    assert le.inverse_transform(enc) == labels


def test_alias_and_filter():
    labels = ["polly", "rebel", "person", "horse"]
    samples = [0, 1, 2, 3]
    assert apply_aliases(labels) == ["dog", "cat", "person", "horse"]
    fs, fl = filter_samples(samples, labels, ["person", "dog", "cat"])
    assert fs == [0, 1, 2]
    assert fl == ["dog", "cat", "person"]


def test_class_weights():
    y = np.array([0, 0, 0, 0, 1, 1, 2])
    w = class_weights(y)
    assert w == {0: 1.0, 1: 2.0, 2: 4.0}


def ref_balance(labels, data, seed=1234):
    """Reference-formula oracle via sklearn (train.py:230-274)."""
    import collections, functools

    mc = collections.Counter(labels).most_common()
    if len(set(c for _, c in mc)) == 1:
        return labels, data
    indices = [np.nonzero(labels == i)[0] for (i, _) in mc]
    labels_list = [labels[i] for i in indices]
    data_list = [data[i] for i in indices]
    _, majority = mc[0]
    up = lambda s: utils.resample(s, replace=True, n_samples=majority, random_state=seed)
    data_up = [up(d) for d in data_list]
    labels_up = [up(l) for l in labels_list]
    return (
        functools.reduce(lambda a, b: np.concatenate((a, b)), labels_up),
        functools.reduce(lambda a, b: np.vstack((a, b)), data_up),
    )


def test_balance_classes_bit_parity(rng):
    y = np.array([0] * 10 + [1] * 4 + [2] * 7)
    X = rng.random((21, 5))
    yb, Xb = balance_classes(y, X)
    yr, Xr = ref_balance(y, X)
    np.testing.assert_array_equal(yb, yr)
    np.testing.assert_array_equal(Xb, Xr)
    # Balanced: every class at majority count
    _, counts = np.unique(yb, return_counts=True)
    assert set(counts) == {10}


def test_balance_classes_with_sup_mask(rng):
    y = np.array([0] * 6 + [1] * 3)
    X = rng.random((9, 4))
    sup = np.array([True] * 5 + [False] * 4)
    Xb, yb, supb = balance_classes(y, X, sup_mask=sup, shuffle=False)
    assert Xb.shape[0] == yb.size == supb.size == 12


def test_split_matches_sklearn(rng):
    n = 50
    X = rng.random((n, 3))
    y = rng.integers(0, 3, n)
    (Xtr, ytr), (Xv, yv), (Xte, yte) = train_val_test_split(X, y, (0.8, 0.1, 0.1))
    sk_Xtr, sk_Xvt, sk_ytr, sk_yvt = model_selection.train_test_split(
        X, y, test_size=0.2, random_state=1234, shuffle=True
    )
    np.testing.assert_array_equal(Xtr, sk_Xtr)
    np.testing.assert_array_equal(ytr, sk_ytr)
    val_split = int(len(sk_Xvt) * 0.5)
    np.testing.assert_array_equal(Xv, sk_Xvt[:val_split])
    np.testing.assert_array_equal(Xte, sk_Xvt[val_split:])


def test_synthetic_dataset_shapes_and_determinism():
    s1, l1 = make_dataset(5, seed=42)
    s2, l2 = make_dataset(5, seed=42)
    assert l1 == l2
    np.testing.assert_array_equal(s1[0][0], s2[0][0])
    xz, yz, xy = stack_samples(s1)
    assert xz.shape == (5, 22, 176)
    assert yz.shape == (5, 31, 176)
    assert xy.shape == (5, 22, 31)
    assert xz.max() <= 255.0 and xz.min() >= 0.0


def test_scan_batch_targets_consistent():
    cubes, targets = make_scan_batch(3, seed=9)
    assert cubes.shape == (3, 22, 31, 176)
    for c, t in zip(cubes, targets):
        # planted blob should dominate its neighborhood
        assert c[t.i, t.j, t.k] > np.median(c) + 50


def test_preprocess_scaling_conventions(rng):
    """Scale conventions match the reference: /255 (SVM), [-1,1]
    (DNN/SGAN), and the SGAN unscale roundtrip (sgan.py:464)."""
    from radarml_tpu.core.arena import RADAR_MAX
    from radarml_tpu.data.preprocess import (
        scale_to_symmetric,
        scale_to_unit_interval,
        unscale_from_symmetric,
    )

    planes = rng.random((4, 5)) * RADAR_MAX
    np.testing.assert_allclose(
        scale_to_unit_interval(planes), planes / 255.0
    )
    sym = scale_to_symmetric(planes)
    assert sym.min() >= -1.0 and sym.max() <= 1.0
    np.testing.assert_allclose(unscale_from_symmetric(sym), planes, atol=1e-9)


def test_preprocess_multiview_shapes_and_split(rng):
    from radarml_tpu.data.preprocess import preprocess_multiview
    from radarml_tpu.data.synthetic import make_dataset

    samples, labels = make_dataset(20, seed=3)
    pre = preprocess_multiview(samples, labels, rescale=(16, 16),
                               train_split=0.75)
    assert pre["X_train"].shape == (15, 16, 16, 3)
    assert pre["X_val"].shape == (5, 16, 16, 3)
    # Bicubic resampling overshoots slightly beyond [-1, 1] — exactly
    # as PIL's float-mode BICUBIC does in the reference (dnn.py:243).
    assert pre["X_train"].min() >= -1.2 and pre["X_train"].max() <= 1.2
    assert pre["n_classes"] == len(pre["label_encoder"].classes_)
    # SGAN empty-val fallback (sgan.py:722-723)
    pre2 = preprocess_multiview(samples, labels, rescale=(16, 16),
                                train_split=1.0,
                                sup_mask=[True] * len(labels))
    assert pre2["X_val"].shape[0] > 0


def test_preprocess_multiview_train_concat_augment(rng):
    """train_concat mode: validation stays clean, augmented copies are
    appended to the clean train set with matching labels, and the sup
    path keeps flags aligned (quality recipe; the reference's replace
    mode, dnn.py:207-209, augments val data too)."""
    import jax

    from radarml_tpu.data.preprocess import preprocess_multiview
    from radarml_tpu.data.synthetic import make_dataset
    from radarml_tpu.ops.augment import augment_multiview

    samples, labels = make_dataset(20, seed=3)

    def aug(views, rng_np):
        return augment_multiview(
            views, jax.random.PRNGKey(int(rng_np.integers(2**31))),
            noise_sd=0.1,
        )

    clean = preprocess_multiview(samples, labels, rescale=(16, 16),
                                 train_split=0.75)
    pre = preprocess_multiview(samples, labels, rescale=(16, 16),
                               train_split=0.75, augment_fn=aug,
                               augment_mode="train_concat",
                               augment_copies=2)
    n0 = clean["X_train"].shape[0]
    assert pre["X_train"].shape[0] == 3 * n0
    np.testing.assert_allclose(pre["X_val"], clean["X_val"])
    np.testing.assert_array_equal(pre["y_val"], clean["y_val"])
    np.testing.assert_allclose(pre["X_train"][:n0], clean["X_train"])
    np.testing.assert_array_equal(pre["y_train"][:n0], clean["y_train"])
    np.testing.assert_array_equal(pre["y_train"][n0:2 * n0],
                                  clean["y_train"])
    # copies are actually augmented, not clones
    assert not np.allclose(pre["X_train"][n0:2 * n0], clean["X_train"])
    # sup path: flags follow their originals; empty-val fallback is clean
    pre_s = preprocess_multiview(
        samples, labels, rescale=(16, 16), train_split=1.0,
        sup_mask=[True] * 10 + [False] * 10, balance=True,
        augment_fn=aug, augment_mode="train_concat", augment_copies=1,
    )
    assert pre_s["X_val"].shape[0] == 20
    assert pre_s["sup_train"].shape[0] == pre_s["X_train"].shape[0]

    with pytest.raises(ValueError):
        preprocess_multiview(samples, labels, rescale=(16, 16),
                             augment_fn=aug, augment_mode="bogus")
    # augment_copies does what it says: 0 appends nothing (it used to
    # silently append one copy), negatives are loud
    pre0 = preprocess_multiview(samples, labels, rescale=(16, 16),
                                train_split=0.75, augment_fn=aug,
                                augment_mode="train_concat",
                                augment_copies=0)
    assert pre0["X_train"].shape[0] == n0
    np.testing.assert_allclose(pre0["X_train"], clean["X_train"])
    with pytest.raises(ValueError, match="augment_copies"):
        preprocess_multiview(samples, labels, rescale=(16, 16),
                             augment_fn=aug,
                             augment_mode="train_concat",
                             augment_copies=-1)


def test_balance_classes_sup_mask_early_return_order(rng):
    """Already-balanced input with a sup mask returns (data, labels,
    sup) unchanged — the SGAN-variant order (reference sgan.py:336-337);
    regression for a swap that fed labels as X_train."""
    y = np.array([0] * 4 + [1] * 4 + [2] * 4)
    X = rng.random((12, 4))
    sup = np.array([True] * 6 + [False] * 6)
    Xb, yb, supb = balance_classes(y, X, sup_mask=sup, shuffle=True)
    np.testing.assert_array_equal(Xb, X)
    np.testing.assert_array_equal(yb, y)
    np.testing.assert_array_equal(supb, sup)
