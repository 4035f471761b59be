"""SGAN training schedule: one fused XLA step for the 4-phase update.

Re-design of the reference's training loop (sgan.py:396-543). Each
reference step issues four Keras `train_on_batch` calls — supervised
classifier on a labeled half-batch, unsupervised discriminator on real
(positive labels smoothed into [0.7, 1.2]) and on generated (negative
smoothed into [0, 0.3]) half-batches, then the stacked GAN on a full
batch of latents labeled real. Here all four sequential updates compile
into ONE jitted device program per step; the host only draws batch
indices.

Faithfully carried Keras semantics:

* three independent Adam(2e-4, β1 0.5, ε 1e-7) optimizers — the same
  discriminator weight has separate moment estimates under the c- and
  d-losses, as separately-compiled Keras models do;
* the GAN phase updates the generator AND the discriminator's
  BatchNorm scale/bias only (define_gan freezes every non-BN layer,
  sgan.py:220-225), realized as a gradient mask;
* fake samples for the d-phase come from the generator in inference
  mode (`generator.predict`, running BN stats, no stat update), while
  the GAN phase runs the generator in training mode (batch stats,
  stats updated) — an easy-to-miss asymmetry of the reference;
* dropout is live in every phase; discriminator BN uses batch stats in
  every phase (its layers stay `trainable=True` for c/d and BN stays
  trainable even in the GAN composite);
* `class_weight` on the real-d update collapses to a constant scale of
  w_classes[1] because the smoothed binary targets all round to 1 — we
  reproduce that as a loss scale (reference sgan.py:528-530).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import pickle
import time
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from radarml_tpu.models.sgan import (
    LATENT_DIM,
    Discriminator,
    Generator,
    custom_activation,
)

logger = logging.getLogger(__name__)

__all__ = [
    "SGANConfig",
    "SGANState",
    "sgan_init",
    "make_sgan_step",
    "train_sgan",
    "select_supervised_samples",
    "generate_fake_dataset",
    "recalibrate_bn_stats",
    "recalibrate_gen_stats",
]

# Native (cols, rows) projection sizes generated fakes are resized back
# to (reference sgan.py:43-45).
# Cache of jitted step functions keyed by the step-relevant config:
# repeated make_sgan_step calls (tests, resume, multiple train runs in
# one process) reuse one compiled program.
_STEP_CACHE: dict = {}

XZ_SIZE = (176, 22)
YZ_SIZE = (176, 31)
XY_SIZE = (31, 22)


@dataclasses.dataclass(frozen=True)
class SGANConfig:
    n_classes: int = 3
    latent_dim: int = LATENT_DIM
    n_epochs: int = 15
    n_batch: int = 32
    learning_rate: float = 2e-4
    beta1: float = 0.5
    n_sup_samples: int = 150
    seed: int = 1234


class SGANState(NamedTuple):
    g_params: dict
    g_stats: dict
    d_params: dict
    d_stats: dict
    c_opt: optax.OptState
    d_opt: optax.OptState
    gan_opt: optax.OptState


def _adam(cfg: SGANConfig):
    return optax.adam(cfg.learning_rate, b1=cfg.beta1, eps=1e-7)


def _bn_mask(tree) -> dict:
    """Gradient mask: True only for BatchNorm leaves (Keras freeze rule)."""

    def mark(path, _):
        return any(
            isinstance(k, jax.tree_util.DictKey)
            and str(k.key).startswith("BatchNorm")
            for k in path
        )

    return jax.tree_util.tree_map_with_path(mark, tree)


def sgan_init(
    key: jax.Array, cfg: SGANConfig, rescale: Tuple[int, int] = (128, 128)
) -> Tuple[Generator, Discriminator, SGANState]:
    if rescale[0] != rescale[1] or rescale[0] % 8:
        raise ValueError("rescale must be square and 8·2^n")
    n_up = int(np.log2(rescale[0] // 8))
    if 8 * 2**n_up != rescale[0]:
        raise ValueError("rescale side must be 8·2^n")
    gen = Generator(n_upsamples=n_up)
    disc = Discriminator(n_classes=cfg.n_classes)
    kg, kd, kdrop = jax.random.split(key, 3)
    z = jnp.zeros((1, cfg.latent_dim), jnp.float32)
    views = tuple(
        jnp.zeros((1,) + rescale + (1,), jnp.float32) for _ in range(3)
    )
    gv = gen.init(kg, z, train=False)
    dv = disc.init({"params": kd, "dropout": kdrop}, views, train=False)
    g_params, g_stats = gv["params"], gv.get("batch_stats", {})
    d_params, d_stats = dv["params"], dv.get("batch_stats", {})
    adam = _adam(cfg)
    state = SGANState(
        g_params=g_params,
        g_stats=g_stats,
        d_params=d_params,
        d_stats=d_stats,
        c_opt=adam.init(d_params),
        d_opt=adam.init(d_params),
        gan_opt=adam.init((g_params, d_params)),
    )
    return gen, disc, state


def _bce(p: jax.Array, y: jax.Array) -> jax.Array:
    """Keras binary_crossentropy on probabilities, clipped like Keras."""
    eps = 1e-7
    p = jnp.clip(p, eps, 1.0 - eps)
    return -jnp.mean(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))


def make_sgan_step(
    gen: Generator, disc: Discriminator, cfg: SGANConfig,
    real_weight: float = 1.0,
    mesh=None,
):
    """Build the fused 4-phase jitted train step.

    Signature: step(state, sup_views, sup_labels, real_views, key)
    → (state, losses dict). Views are (B, H, W, 3) stacks split into
    per-projection (B, H, W, 1) inputs inside.

    With `mesh`, batches shard over the 'data' axis and parameters
    replicate; XLA inserts the gradient/batch-stat collectives (flax
    BatchNorm means over the sharded batch axis become cross-chip
    reductions automatically).
    """
    cache_key = (
        gen, disc, cfg.latent_dim, cfg.n_batch, cfg.learning_rate,
        cfg.beta1, cfg.n_classes, real_weight, mesh,
    )
    cached = _STEP_CACHE.get(cache_key)
    if cached is not None:
        return cached

    adam = _adam(cfg)
    if mesh is not None:
        from radarml_tpu.parallel.mesh import batch_sharding, replicated

        data_sh = batch_sharding(mesh)
        rep_sh = replicated(mesh)

    def split_views(stack):
        return tuple(stack[..., i : i + 1] for i in range(3))

    def step(state: SGANState, sup_views, sup_labels, real_views, key):
        if mesh is not None:
            sup_views = jax.lax.with_sharding_constraint(sup_views, data_sh)
            real_views = jax.lax.with_sharding_constraint(real_views, data_sh)
            state = jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, rep_sh), state
            )
        k_cdrop, k_rdrop, k_fdrop, k_gdrop, k_zf, k_zg, k_sm = jax.random.split(
            key, 7
        )
        half = sup_labels.shape[0]
        full = cfg.n_batch

        # ---- phase 1: supervised classifier on labeled half-batch ----
        def c_loss_fn(d_params, stats):
            logits, mut = disc.apply(
                {"params": d_params, "batch_stats": stats},
                split_views(sup_views),
                train=True,
                rngs={"dropout": k_cdrop},
                mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(logits)
            loss = -jnp.mean(
                jnp.take_along_axis(logp, sup_labels[:, None], axis=1)
            )
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == sup_labels).astype(jnp.float32)
            )
            return loss, (mut["batch_stats"], acc)

        (c_loss, (d_stats, c_acc)), grads = jax.value_and_grad(
            c_loss_fn, has_aux=True
        )(state.d_params, state.d_stats)
        upd, c_opt = adam.update(grads, state.c_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, upd)

        # ---- phase 2: unsupervised d on real, positive smoothing ----
        y_real = 1.0 - 0.3 + jax.random.uniform(k_sm, (half, 1)) * 0.5

        def d_real_fn(dp, stats):
            logits, mut = disc.apply(
                {"params": dp, "batch_stats": stats},
                split_views(real_views),
                train=True,
                rngs={"dropout": k_rdrop},
                mutable=["batch_stats"],
            )
            p = custom_activation(logits)
            return real_weight * _bce(p, y_real), mut["batch_stats"]

        (dr_loss, d_stats), grads = jax.value_and_grad(
            d_real_fn, has_aux=True
        )(d_params, d_stats)
        upd, d_opt = adam.update(grads, state.d_opt, d_params)
        d_params = optax.apply_updates(d_params, upd)

        # ---- phase 3: d on fakes (generator in inference mode) ----
        z = jax.random.normal(k_zf, (half, cfg.latent_dim))
        fake = gen.apply(
            {"params": state.g_params, "batch_stats": state.g_stats},
            z, train=False,
        )
        fake = jax.lax.stop_gradient(jnp.concatenate(fake, axis=-1))
        y_fake = jax.random.uniform(jax.random.fold_in(k_sm, 1), (half, 1)) * 0.3

        def d_fake_fn(dp, stats):
            logits, mut = disc.apply(
                {"params": dp, "batch_stats": stats},
                split_views(fake),
                train=True,
                rngs={"dropout": k_fdrop},
                mutable=["batch_stats"],
            )
            p = custom_activation(logits)
            return _bce(p, y_fake), mut["batch_stats"]

        (df_loss, d_stats), grads = jax.value_and_grad(
            d_fake_fn, has_aux=True
        )(d_params, d_stats)
        upd, d_opt = adam.update(grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, upd)

        # ---- phase 4: generator via the stacked GAN ----
        z_gan = jax.random.normal(k_zg, (full, cfg.latent_dim))
        y_gan = 1.0 - 0.3 + jax.random.uniform(
            jax.random.fold_in(k_sm, 2), (full, 1)
        ) * 0.5

        def gan_loss_fn(params, g_stats, d_stats):
            gp, dp = params
            fake3, gmut = gen.apply(
                {"params": gp, "batch_stats": g_stats},
                z_gan, train=True, mutable=["batch_stats"],
            )
            logits, dmut = disc.apply(
                {"params": dp, "batch_stats": d_stats},
                fake3,
                train=True,
                rngs={"dropout": k_gdrop},
                mutable=["batch_stats"],
            )
            p = custom_activation(logits)
            return _bce(p, y_gan), (gmut["batch_stats"], dmut["batch_stats"])

        (g_loss, (g_stats, d_stats)), grads = jax.value_and_grad(
            gan_loss_fn, has_aux=True
        )((state.g_params, d_params), state.g_stats, d_stats)
        g_grads, d_grads = grads
        # Freeze everything in the discriminator except BatchNorm.
        mask = _bn_mask(d_grads)
        d_grads = jax.tree.map(
            lambda g, m: g if m else jnp.zeros_like(g), d_grads, mask
        )
        upd, gan_opt = adam.update(
            (g_grads, d_grads), state.gan_opt, (state.g_params, d_params)
        )
        g_params, d_params = optax.apply_updates(
            (state.g_params, d_params), upd
        )

        new_state = SGANState(
            g_params=g_params,
            g_stats=g_stats,
            d_params=d_params,
            d_stats=d_stats,
            c_opt=c_opt,
            d_opt=d_opt,
            gan_opt=gan_opt,
        )
        losses = {
            "c_loss": c_loss, "c_acc": c_acc, "d_real": dr_loss,
            "d_fake": df_loss, "gan": g_loss,
        }
        return new_state, losses

    fn = jax.jit(step)
    _STEP_CACHE[cache_key] = fn
    return fn


def select_supervised_samples(
    X: np.ndarray,
    y: np.ndarray,
    sup_mask: Optional[np.ndarray],
    n_samples: int,
    n_classes: int,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """Balanced labeled subset (sgan.py:406-422); with-replacement draw.

    Selection indices come from the (small, host) label vector only, so
    a device-resident X gathers on device without a host round trip.
    """
    if sup_mask is None:
        sup_mask = np.ones(len(y), bool)
    y = np.asarray(y)
    sup_mask = np.asarray(sup_mask, bool)
    n_per = n_samples // n_classes
    sel, ys = [], []
    for c in range(n_classes):
        pool_idx = np.nonzero((y == c) & sup_mask)[0]
        if len(pool_idx) == 0:
            raise ValueError(f"Not enough class {c} sup samples")
        ix = rng.integers(0, len(pool_idx), n_per)
        sel.append(pool_idx[ix])
        ys.append(np.full(n_per, c))
    sel = np.concatenate(sel)
    if isinstance(X, np.ndarray):
        X_sup = X[sel]
    else:
        X_sup = jnp.take(X, jnp.asarray(sel), axis=0)
    return X_sup, np.concatenate(ys)


def generate_fake_dataset(
    gen: Generator,
    g_params,
    g_stats,
    n_samples: int,
    key: jax.Array,
    latent_dim: int = LATENT_DIM,
) -> Dict:
    """Reference summarize_performance data product (sgan.py:457-501):
    generate fakes, rescale [-1,1]→[0,255], bicubic-resize back to the
    native projection sizes, package as a reference-format dataset."""
    from radarml_tpu.core.arena import RADAR_MAX
    from radarml_tpu.ops.resample import bicubic_pair, resample2d

    z = jax.random.normal(key, (n_samples, latent_dim))
    xz, yz, xy = gen.apply(
        {"params": g_params, "batch_stats": g_stats}, z, train=False
    )
    outs = []
    for stack, (cols, rows) in ((xz, XZ_SIZE), (yz, YZ_SIZE), (xy, XY_SIZE)):
        planes = RADAR_MAX * (stack[..., 0] + 1.0) / 2.0
        r, c = bicubic_pair(planes.shape[1:], (rows, cols))
        outs.append(
            np.asarray(
                resample2d(planes, jnp.asarray(r, jnp.float32),
                           jnp.asarray(c, jnp.float32))
            )
        )
    XZ, YZ, XY = outs
    samples = [(XZ[i], YZ[i], XY[i]) for i in range(n_samples)]
    return {"samples": samples, "labels": ["generated_data"] * n_samples}


def train_sgan(
    gen: Generator,
    disc: Discriminator,
    state: SGANState,
    train_set: Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]],
    val_set: Tuple[np.ndarray, np.ndarray],
    cfg: SGANConfig = SGANConfig(),
    w_classes: Optional[Dict[int, float]] = None,
    results_dir: Optional[str] = None,
    summarize_every: Optional[int] = None,
    on_summary: Optional[Callable] = None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
) -> SGANState:
    """Run the reference schedule: bat_per_epo × n_epochs fused steps,
    with per-epoch-equivalent evaluation + artifact dump.

    With `checkpoint_dir`, full state (both nets + all three optimizer
    states) checkpoints every summarize interval via orbax; `resume`
    restores the latest checkpoint and continues mid-run — a capability
    the reference lacks (SURVEY.md §5 "no mid-run restore logic").
    """
    X, y, sup = train_set
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    X_sup, y_sup = select_supervised_samples(
        X, y, sup, cfg.n_sup_samples, cfg.n_classes, rng
    )
    bat_per_epo = max(int(X.shape[0] / cfg.n_batch), 1)
    n_steps = bat_per_epo * cfg.n_epochs
    half = cfg.n_batch // 2
    real_weight = float(w_classes.get(1, 1.0)) if w_classes else 1.0
    step_fn = make_sgan_step(gen, disc, cfg, real_weight=real_weight)
    every = summarize_every or bat_per_epo

    store = None
    start_step = 0
    if checkpoint_dir:
        from radarml_tpu.train.checkpoint import CheckpointStore

        store = CheckpointStore(checkpoint_dir)
        if resume and store.latest_step() is not None:
            start_step, state, _ = store.restore(template=state)
            state = jax.tree.map(jnp.asarray, state)
            # Re-derive the host RNG/key streams to their position.
            for _ in range(start_step):
                rng.integers(0, len(y_sup), half)
                rng.integers(0, X.shape[0], half)
                key, _ = jax.random.split(key)
            logger.info("resumed from checkpoint step %d", start_step)

    logger.info(
        "n_epochs=%d, n_batch=%d, 1/2=%d, b/e=%d, steps=%d",
        cfg.n_epochs, cfg.n_batch, half, bat_per_epo, n_steps,
    )
    # Keep the dataset device-resident and gather batches on device:
    # per-step host work is two tiny index uploads and one dispatch.
    # (Uploading each batch and syncing losses per step costs seconds
    # per step when the device sits behind a high-latency link.)
    X_sup_d = jnp.asarray(X_sup)
    y_sup_d = jnp.asarray(y_sup, jnp.int32)
    X_d = jnp.asarray(X)

    # Dataset arrays are jit ARGUMENTS, not closure captures — captured
    # concrete arrays embed as HLO constants, bloating the compiled
    # program by the full dataset size (see train/trainer.py).
    @jax.jit
    def data_step(state, Xs, ys, Xr, six, rix, key):
        return step_fn(
            state,
            jnp.take(Xs, six, axis=0),
            jnp.take(ys, six, axis=0),
            jnp.take(Xr, rix, axis=0),
            key,
        )

    debug = logger.isEnabledFor(logging.DEBUG)
    t0 = time.perf_counter()

    # Fused-chunk schedule: every run of steps between summaries is ONE
    # lax.scan dispatch (index matrices upload once per chunk; the PRNG
    # key is carried/split inside, exactly mirroring the per-step
    # stream). Per-step host dispatch through a high-latency link costs
    # ~30 ms — ~10× the step's compute — so chunking sets the step rate
    # by device time. Debug logging falls back to per-step dispatches
    # (it syncs losses anyway).
    @jax.jit
    def run_chunk(state, key, Xs, ys, Xr, six_all, rix_all):
        def body(carry, xs):
            state, key = carry
            six, rix = xs
            key, sk = jax.random.split(key)
            state, losses = step_fn(
                state,
                jnp.take(Xs, six, axis=0),
                jnp.take(ys, six, axis=0),
                jnp.take(Xr, rix, axis=0),
                sk,
            )
            return (state, key), losses

        (state, key), losses = jax.lax.scan(
            body, (state, key), (six_all, rix_all)
        )
        return state, key, losses

    i = start_step
    while i < n_steps:
        boundary = min(((i // every) + 1) * every, n_steps)
        chunk = boundary - i
        # Per-step draw order (six then rix) preserved for stream
        # parity with resume replay and prior runs.
        six_np = np.empty((chunk, half), np.int32)
        rix_np = np.empty((chunk, half), np.int32)
        for s in range(chunk):
            six_np[s] = rng.integers(0, len(y_sup), half)
            rix_np[s] = rng.integers(0, X.shape[0], half)
        if debug:
            for s in range(chunk):
                key, sk = jax.random.split(key)
                state, losses = data_step(
                    state, X_sup_d, y_sup_d, X_d,
                    jnp.asarray(six_np[s]), jnp.asarray(rix_np[s]), sk,
                )
                logger.debug(
                    "Training results at step %d: c[%.3f,%.0f], d_r[%.3f], "
                    "d_f[%.3f], g[%.3f]",
                    i + s + 1,
                    float(losses["c_loss"]), float(losses["c_acc"]) * 100,
                    float(losses["d_real"]), float(losses["d_fake"]),
                    float(losses["gan"]),
                )
        else:
            state, key, _ = run_chunk(
                state, key, X_sup_d, y_sup_d, X_d,
                jnp.asarray(six_np), jnp.asarray(rix_np),
            )
        i = boundary
        if i % every == 0:
            # Eval/checkpoint/artifacts see precise-BN population
            # stats, not the slow momentum-0.99 EMA warmup (see
            # recalibrate_bn_stats / recalibrate_gen_stats).
            state = recalibrate_bn_stats(disc, state, X_d, seed=i - 1)
            state = recalibrate_gen_stats(
                gen, state, jax.random.fold_in(key, 7), cfg.latent_dim
            )
            _summarize(
                i - 1, gen, disc, state, val_set, cfg, results_dir, key,
                on_summary,
            )
            if store is not None:
                store.save(i, state)
    if n_steps % every:
        state = recalibrate_bn_stats(disc, state, X_d, seed=n_steps)
        state = recalibrate_gen_stats(
            gen, state, jax.random.fold_in(key, 11), cfg.latent_dim
        )
    done = n_steps - start_step
    logger.info(
        "%d steps in %.1fs (%.2f steps/s)",
        done, time.perf_counter() - t0,
        done / max(time.perf_counter() - t0, 1e-9),
    )
    return state


_RECAL_CACHE: dict = {}


def _pool_stats(tree):
    """Pooled BatchNorm stats over a leading P axis: exact population
    moments of the union of P equal-size batches (mean of means;
    E[var + mean²] − pooled_mean²)."""
    if isinstance(tree, dict) and set(tree) == {"mean", "var"}:
        m = jnp.mean(tree["mean"], axis=0)
        v = jnp.mean(tree["var"] + tree["mean"] ** 2, axis=0) - m**2
        return {"mean": m, "var": jnp.maximum(v, 0.0)}
    if isinstance(tree, dict):
        return {k: _pool_stats(v) for k, v in tree.items()}
    raise TypeError(f"unexpected batch_stats node {type(tree)}")


def _recal_fn(disc: Discriminator):
    """Jitted precise-BN stat pooling, cached per discriminator.

    Takes (d_params, template_stats, batches (P,B,H,W,3)) and returns
    pooled population batch_stats.
    """
    fn = _RECAL_CACHE.get(disc)
    if fn is not None:
        return fn
    # rate-0 dropout is an identity (no rng needed) and momentum 0
    # makes the mutable batch_stats return exactly each batch's
    # (mean, var) — independent of the carried stats, since train-mode
    # BN normalizes by the current batch.
    recal = disc.clone(dropout_rate=0.0, bn_momentum=0.0)
    pool = _pool_stats

    @jax.jit
    def fn(d_params, stats, batches):
        def body(carry, xb):
            views = tuple(xb[..., i : i + 1] for i in range(3))
            _, mut = recal.apply(
                {"params": d_params, "batch_stats": carry},
                views, train=True, mutable=["batch_stats"],
            )
            return carry, mut["batch_stats"]

        _, per_batch = jax.lax.scan(body, stats, batches)
        return pool(per_batch)

    _RECAL_CACHE[disc] = fn
    return fn


def recalibrate_bn_stats(
    disc: Discriminator,
    state: SGANState,
    X,
    batch: int = 64,
    n_passes: int = 16,
    seed: int = 0,
) -> SGANState:
    """Precise-BN: replace the discriminator's running statistics with
    population statistics measured under eval conditions (dropout off,
    each batch normalized by its own stats).

    Keras-parity momentum-0.99 EMAs need ~600 steps to forget their
    (0, 1) initialization — far longer than a short schedule on a small
    dataset — so inference-mode eval reads near-chance while train-mode
    accuracy is high. Recomputing the stats directly over real data
    makes every eval/checkpoint reflect the learned classifier
    regardless of step count. One fused scan dispatch; stats are exact
    pooled moments, not an EMA. (The reference masks this problem with
    3465 training steps, sgan.py:504-543 + README.md:173.)
    """
    X = jnp.asarray(X)
    n = X.shape[0]
    rng = np.random.default_rng(seed)
    idx = jnp.asarray(
        rng.integers(0, n, size=(n_passes * batch,)), jnp.int32
    )
    batches = jnp.take(X, idx, axis=0).reshape(
        (n_passes, batch) + tuple(X.shape[1:])
    )
    stats = _recal_fn(disc)(state.d_params, state.d_stats, batches)
    return state._replace(d_stats=stats)


_GEN_RECAL_CACHE: dict = {}


def _gen_recal_fn(gen: Generator):
    """Jitted precise-BN pooling for the generator, cached per module."""
    fn = _GEN_RECAL_CACHE.get(gen)
    if fn is not None:
        return fn
    recal = gen.clone(bn_momentum=0.0)
    pool = _pool_stats

    @jax.jit
    def fn(g_params, stats, zs):
        def body(carry, z):
            _, mut = recal.apply(
                {"params": g_params, "batch_stats": carry},
                z, train=True, mutable=["batch_stats"],
            )
            return carry, mut["batch_stats"]

        _, per_batch = jax.lax.scan(body, stats, zs)
        return pool(per_batch)

    _GEN_RECAL_CACHE[gen] = fn
    return fn


def recalibrate_gen_stats(
    gen: Generator,
    state: SGANState,
    key: jax.Array,
    latent_dim: int = LATENT_DIM,
    batch: int = 32,
    n_passes: int = 16,
) -> SGANState:
    """Precise-BN for the generator: population stats over fresh latent
    draws, so inference-mode generation (`generate_fake_dataset`, the
    reference's per-epoch artifact, sgan.py:457-501) reflects the
    trained generator on short schedules instead of the slow
    momentum-0.99 EMA warmup. Same construction as
    `recalibrate_bn_stats`; the input distribution here is the latent
    prior itself, so recalibration needs no data."""
    zs = jax.random.normal(key, (n_passes, batch, latent_dim))
    stats = _gen_recal_fn(gen)(state.g_params, state.g_stats, zs)
    return state._replace(g_stats=stats)


_EVAL_CACHE: dict = {}


def _eval_fn(disc: Discriminator):
    """Jitted inference-mode logits fn, cached per discriminator."""
    fn = _EVAL_CACHE.get(disc)
    if fn is None:

        @jax.jit
        def fn(d_params, d_stats, xb):
            views = tuple(xb[..., i : i + 1] for i in range(3))
            return disc.apply(
                {"params": d_params, "batch_stats": d_stats},
                views, train=False,
            )

        _EVAL_CACHE[disc] = fn
    return fn


def classifier_eval(
    disc: Discriminator, state: SGANState, X: np.ndarray, y: np.ndarray,
    batch: int = 64,
) -> float:
    """Supervised-head accuracy in inference mode.

    Ragged tails pad up to the batch size (one compiled program for the
    whole eval) and padding rows are ignored in the count.
    """
    fn = _eval_fn(disc)
    Xd = jnp.asarray(X, jnp.float32)  # no-op for device-resident X
    correct = 0
    for s in range(0, len(y), batch):
        xb = Xd[s : s + batch]
        n = xb.shape[0]
        if n < batch:
            xb = jnp.concatenate(
                [xb, jnp.zeros((batch - n,) + xb.shape[1:], xb.dtype)]
            )
        logits = fn(state.d_params, state.d_stats, xb)
        pred = np.asarray(logits).argmax(-1)[:n]  # small (batch, C) fetch
        correct += int((pred == y[s : s + n]).sum())
    return correct / max(len(y), 1)


def _summarize(i, gen, disc, state, val_set, cfg, results_dir, key, on_summary):
    acc = classifier_eval(disc, state, val_set[0], val_set[1])
    logger.info("Classifier accuracy at step %d: %.2f%%", i + 1, acc * 100)
    if results_dir:
        os.makedirs(results_dir, exist_ok=True)
        data = generate_fake_dataset(
            gen, state.g_params, state.g_stats, 100, key, cfg.latent_dim
        )
        path = os.path.join(results_dir, f"generated_data_{i + 1:04d}.pickle")
        with open(path, "wb") as fp:
            pickle.dump(data, fp)
        ck = os.path.join(results_dir, f"sgan_state_{i + 1:04d}.pickle")
        with open(ck, "wb") as fp:
            pickle.dump(jax.tree.map(np.asarray, state._asdict()), fp)
        logger.info("Saved: %s and %s", path, ck)
    if on_summary is not None:
        on_summary(i, acc, state)
