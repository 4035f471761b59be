"""Adam training harness for the multi-view CNN.

Re-design of the reference's Keras fit loop (dnn.py:347-391): Adam
(lr 2e-4, β1 0.5), sparse categorical cross-entropy with class weights
(dnn.py:89-90, 379), early stopping on val loss with patience 10, and
best-checkpoint retention (dnn.py:358-370). The loop body is one jitted
train step; with a mesh the batch shards over the 'data' axis and XLA
reduces the gradients over ICI.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from radarml_tpu.parallel.mesh import batch_sharding, replicate, replicated

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Defaults mirror the reference's dnn.py fit call."""

    batch_size: int = 64
    epochs: int = 100
    learning_rate: float = 2e-4
    beta1: float = 0.5
    patience: int = 10
    seed: int = 1234


def weighted_xent_loss(logits: jax.Array, y: jax.Array, weights: jax.Array):
    """Per-sample class-weighted sparse categorical cross-entropy.

    Keras class_weight semantics: each sample's loss scales by its
    class's weight; the batch loss is the weighted mean.
    """
    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
    w = weights[y]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def train_cnn(
    model,
    params,
    X_train: np.ndarray,
    y_train: np.ndarray,
    X_val: np.ndarray,
    y_val: np.ndarray,
    w_classes: Optional[Dict[int, float]] = None,
    config: TrainConfig = TrainConfig(),
    mesh=None,
) -> Tuple[dict, Dict[str, List[float]]]:
    """Train, keeping the best-val-loss parameters.

    Returns:
        (best_params, history) where history has per-epoch loss,
        accuracy, val_loss, val_accuracy (the Keras history contract the
        reference logs, dnn.py:382-389).
    """
    n_classes = int(max(y_train.max(), y_val.max() if y_val.size else 0)) + 1
    if w_classes is None:
        weights = np.ones(n_classes, dtype=np.float32)
    else:
        weights = np.array(
            [w_classes.get(c, 1.0) for c in range(n_classes)], dtype=np.float32
        )
    weights_dev = jnp.asarray(weights)

    tx = optax.adam(config.learning_rate, b1=config.beta1)
    opt_state = tx.init(params)

    if mesh is not None:
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        rep_sh = replicated(mesh)
        data_sh = batch_sharding(mesh)

    @jax.jit
    def train_step(params, opt_state, xb, yb, dropout_key):
        if mesh is not None:
            xb = jax.lax.with_sharding_constraint(xb, data_sh)

        def loss_fn(p):
            logits = model.apply(
                {"params": p}, xb, train=True, rngs={"dropout": dropout_key}
            )
            loss = weighted_xent_loss(logits, yb, weights_dev)
            acc = (logits.argmax(-1) == yb).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if mesh is not None:
            params = jax.lax.with_sharding_constraint(params, rep_sh)
        return params, opt_state, loss, acc

    @jax.jit
    def eval_step(params, xb, yb):
        logits = model.apply({"params": params}, xb, train=False)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, yb[:, None], axis=1)[:, 0]
        correct = (logits.argmax(-1) == yb).astype(jnp.float32)
        return nll.sum(), correct.sum()

    def evaluate(params, X, y):
        total_nll, total_correct, n = 0.0, 0.0, 0
        bs = config.batch_size
        for s in range(0, len(y), bs):
            xb = jnp.asarray(X[s : s + bs])
            yb = jnp.asarray(y[s : s + bs])
            nll, corr = eval_step(params, xb, yb)
            total_nll += float(nll)
            total_correct += float(corr)
            n += len(yb)
        return total_nll / max(n, 1), total_correct / max(n, 1)

    rng = np.random.default_rng(config.seed)
    key = jax.random.PRNGKey(config.seed)
    history: Dict[str, List[float]] = {
        "loss": [], "accuracy": [], "val_loss": [], "val_accuracy": []
    }
    best_val = np.inf
    best_params = params
    stale = 0
    n = len(y_train)
    bs = config.batch_size

    for epoch in range(config.epochs):
        t0 = time.perf_counter()
        perm = rng.permutation(n)
        ep_loss, ep_acc, batches = 0.0, 0.0, 0
        for s in range(0, n, bs):
            idx = perm[s : s + bs]
            if mesh is not None and len(idx) % mesh.devices.size != 0:
                # Keep shards equal-sized: drop the ragged tail batch.
                continue
            xb = jnp.asarray(X_train[idx])
            yb = jnp.asarray(y_train[idx])
            key, dk = jax.random.split(key)
            params, opt_state, loss, acc = train_step(
                params, opt_state, xb, yb, dk
            )
            ep_loss += float(loss)
            ep_acc += float(acc)
            batches += 1
        val_loss, val_acc = evaluate(params, X_val, y_val)
        history["loss"].append(ep_loss / max(batches, 1))
        history["accuracy"].append(ep_acc / max(batches, 1))
        history["val_loss"].append(val_loss)
        history["val_accuracy"].append(val_acc)
        logger.info(
            "epoch %d: loss %.4f acc %.4f val_loss %.4f val_acc %.4f (%.2fs)",
            epoch + 1, history["loss"][-1], history["accuracy"][-1],
            val_loss, val_acc, time.perf_counter() - t0,
        )
        if val_loss < best_val:
            best_val = val_loss
            best_params = jax.tree.map(lambda a: np.asarray(a), params)
            stale = 0
        else:
            stale += 1
            if stale >= config.patience:
                logger.info("early stopping at epoch %d", epoch + 1)
                break

    best_idx = int(np.argmin(history["val_loss"]))
    logger.info(
        "Best loss: %.4f, Best acc: %.2f%%",
        history["loss"][best_idx], history["accuracy"][best_idx] * 100,
    )
    logger.info(
        "Best val loss: %.4f, Best val acc: %.2f%%",
        history["val_loss"][best_idx], history["val_accuracy"][best_idx] * 100,
    )
    best_params = jax.tree.map(jnp.asarray, best_params)
    return best_params, history
