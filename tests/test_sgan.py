"""SGAN family: shapes, head math, freeze rule, and a short train run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radarml_tpu.models.sgan import (
    Discriminator,
    Generator,
    custom_activation,
)
from radarml_tpu.train import sgan_trainer as st


SMALL = (16, 16)  # keep unit tests fast; the real pipeline uses 128×128


@pytest.fixture(scope="module")
def small_sgan():
    cfg = st.SGANConfig(n_classes=3, n_batch=8, n_sup_samples=9, seed=0)
    gen, disc, state = st.sgan_init(jax.random.PRNGKey(0), cfg, rescale=SMALL)
    return cfg, gen, disc, state


def test_generator_output_shapes_and_range():
    gen = Generator()
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 100))
    variables = gen.init(jax.random.PRNGKey(0), z, train=False)
    xz, yz, xy = gen.apply(variables, z, train=False)
    for v in (xz, yz, xy):
        assert v.shape == (2, 128, 128, 1)
        assert float(jnp.max(jnp.abs(v))) <= 1.0


def test_custom_activation_is_z_over_z_plus_one():
    logits = jnp.asarray([[0.0, 0.0, 0.0], [10.0, -10.0, 0.0]])
    z = jnp.sum(jnp.exp(logits), axis=-1, keepdims=True)
    want = z / (z + 1.0)
    got = custom_activation(logits)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_bn_mask_marks_only_batchnorm(small_sgan):
    _, _, _, state = small_sgan
    mask = st._bn_mask(state.d_params)
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    marked = [p for p, v in leaves if v]
    unmarked = [p for p, v in leaves if not v]
    assert marked and unmarked
    for p in marked:
        assert any("BatchNorm" in str(k) for k in p)
    for p in unmarked:
        assert not any("BatchNorm" in str(k) for k in p)


def test_fused_step_updates_and_freeze_rule(small_sgan):
    cfg, gen, disc, state = small_sgan
    rng = np.random.default_rng(0)
    sup_views = jnp.asarray(rng.normal(size=(4,) + SMALL + (3,)), jnp.float32)
    sup_labels = jnp.asarray([0, 1, 2, 0], jnp.int32)
    real_views = jnp.asarray(rng.normal(size=(4,) + SMALL + (3,)), jnp.float32)
    step = st.make_sgan_step(gen, disc, cfg)
    new_state, losses = step(
        state, sup_views, sup_labels, real_views, jax.random.PRNGKey(2)
    )
    for k in ("c_loss", "d_real", "d_fake", "gan"):
        assert np.isfinite(float(losses[k])), k
    # generator actually moved
    g_delta = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.g_params, new_state.g_params,
    )
    assert max(jax.tree.leaves(g_delta)) > 0
    # discriminator conv/dense moved via c/d phases too
    d_delta = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.d_params, new_state.d_params,
    )
    assert max(jax.tree.leaves(d_delta)) > 0
    # batch stats updated in both nets
    assert any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(
            jax.tree.leaves(state.g_stats), jax.tree.leaves(new_state.g_stats)
        )
    )


def test_gan_phase_freezes_non_bn_disc_params(small_sgan):
    """With c/d phases disabled (zero lr paths can't express that), we
    check the mask directly: gradients zeroed for non-BN params."""
    cfg, gen, disc, state = small_sgan
    grads = jax.tree.map(jnp.ones_like, state.d_params)
    mask = st._bn_mask(grads)
    masked = jax.tree.map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask
    )
    flat = jax.tree_util.tree_leaves_with_path(masked)
    for path, leaf in flat:
        is_bn = any("BatchNorm" in str(k) for k in path)
        if is_bn:
            assert float(jnp.max(leaf)) == 1.0
        else:
            assert float(jnp.max(jnp.abs(leaf))) == 0.0


def test_select_supervised_samples_balanced():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(30, 4, 4, 3)).astype(np.float32)
    y = np.arange(30) % 3
    sup = np.ones(30, bool)
    sup[y == 2] = False
    sup[[2, 5]] = True  # only two supervised class-2 samples
    Xs, ys = st.select_supervised_samples(X, y, sup, 9, 3, rng)
    assert Xs.shape[0] == 9
    counts = np.bincount(ys)
    assert (counts == 3).all()
    # class-2 draws must come from the supervised pool only
    pool = X[(y == 2) & sup]
    for x in Xs[ys == 2]:
        assert any(np.allclose(x, p) for p in pool)


def test_train_sgan_short_run_and_fake_dataset(tmp_path, small_sgan):
    cfg, gen, disc, state = small_sgan
    rng = np.random.default_rng(1)
    n = 24
    X = rng.normal(size=(n,) + SMALL + (3,)).astype(np.float32) * 0.5
    y = (np.arange(n) % 3).astype(np.int64)
    accs = []
    state = st.train_sgan(
        gen, disc, state,
        (X, y, None), (X[:12], y[:12]),
        dataclasses_replace(cfg, n_epochs=1),
        results_dir=str(tmp_path),
        on_summary=lambda i, acc, s: accs.append(acc),
    )
    assert accs and 0.0 <= accs[-1] <= 1.0
    pickles = list(tmp_path.glob("generated_data_*.pickle"))
    assert pickles
    import pickle as pkl
    with open(pickles[0], "rb") as fp:
        data = pkl.load(fp)
    assert len(data["samples"]) == 100
    xz, yz, xy = data["samples"][0]
    assert xz.shape == (22, 176) and yz.shape == (31, 176) and xy.shape == (22, 31)
    assert data["labels"][0] == "generated_data"


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def test_recalibrate_bn_stats_matches_population_forward(small_sgan):
    """With one pass over the full set, recalibrated running stats make
    inference-mode logits exactly equal a train-mode (batch-stat,
    dropout-off) forward on that set: each layer's stored (mean, var)
    IS the batch statistic the train-mode forward normalizes by."""
    cfg, gen, disc, state = small_sgan
    rng = np.random.default_rng(3)
    X = rng.normal(size=(24,) + SMALL + (3,)).astype(np.float32)

    recal = st.recalibrate_bn_stats(disc, state, X, batch=24, n_passes=1, seed=0)
    # seed irrelevant at batch=n only if draws cover the set; force the
    # exact set instead by bypassing sampling: single pass over X.
    fn = st._recal_fn(disc)
    stats = fn(
        state.d_params, state.d_stats, jnp.asarray(X)[None]
    )
    recal = state._replace(d_stats=stats)

    views = tuple(jnp.asarray(X)[..., i : i + 1] for i in range(3))
    logits_eval = disc.apply(
        {"params": recal.d_params, "batch_stats": recal.d_stats},
        views, train=False,
    )
    clone = disc.clone(dropout_rate=0.0, bn_momentum=0.0)
    logits_train, _ = clone.apply(
        {"params": state.d_params, "batch_stats": state.d_stats},
        views, train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(logits_eval), np.asarray(logits_train), rtol=1e-4, atol=1e-4
    )


def test_recalibrate_pooled_moments_are_population_moments(small_sgan):
    """Pooling over several batches gives the exact union-population
    moments (mean of means; E[x^2]-mean^2), not a momentum EMA."""
    cfg, gen, disc, state = small_sgan
    rng = np.random.default_rng(4)
    X = rng.normal(size=(32,) + SMALL + (3,)).astype(np.float32)
    fn = st._recal_fn(disc)
    # Two half-batches tiling X exactly.
    batches = jnp.asarray(X).reshape((2, 16) + SMALL + (3,))
    stats2 = fn(state.d_params, state.d_stats, batches)

    # First-layer BN input is conv(x): identical in either mode, so its
    # pooled stats must equal the full-set batch stats.
    stats1 = fn(state.d_params, state.d_stats, jnp.asarray(X)[None])
    m2 = np.asarray(stats2["xz"]["BatchNorm_0"]["mean"])
    m1 = np.asarray(stats1["xz"]["BatchNorm_0"]["mean"])
    v2 = np.asarray(stats2["xz"]["BatchNorm_0"]["var"])
    v1 = np.asarray(stats1["xz"]["BatchNorm_0"]["var"])
    np.testing.assert_allclose(m2, m1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(v2, v1, rtol=1e-3, atol=1e-5)


def test_recalibrate_gen_stats_matches_population_forward(small_sgan):
    """Same exactness property as the discriminator test: one pooled
    pass over a latent batch makes inference-mode generation equal the
    train-mode (batch-stat) forward on that batch."""
    cfg, gen, disc, state = small_sgan
    z = jax.random.normal(jax.random.PRNGKey(5), (16, cfg.latent_dim))

    fn = st._gen_recal_fn(gen)
    stats = fn(state.g_params, state.g_stats, z[None])
    recal = state._replace(g_stats=stats)

    out_eval = gen.apply(
        {"params": recal.g_params, "batch_stats": recal.g_stats},
        z, train=False,
    )
    clone = gen.clone(bn_momentum=0.0)
    out_train, _ = clone.apply(
        {"params": state.g_params, "batch_stats": state.g_stats},
        z, train=True, mutable=["batch_stats"],
    )
    for a, b in zip(out_eval, out_train):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )

    # Public API smoke: returns a state with the same stats structure.
    out = st.recalibrate_gen_stats(
        gen, state, jax.random.PRNGKey(6), cfg.latent_dim,
        batch=8, n_passes=2,
    )
    assert jax.tree_util.tree_structure(
        out.g_stats
    ) == jax.tree_util.tree_structure(state.g_stats)
