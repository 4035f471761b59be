"""Data-parallel training steps under jit + mesh shardings.

Gradients reduce across the 'data' axis via XLA-inserted collectives
(psum over ICI within a slice): params are replicated, batches are
sharded, and the compiler propagates shardings through the backward
pass — the standard JAX SPMD recipe, no hand-written NCCL analog.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radarml_tpu.parallel.mesh import DATA_AXIS


def make_dp_sgd_train_step(
    mesh: Mesh, n_classes: int, lr: float = 0.01, weight_decay: float = 0.0
) -> Callable:
    """One softmax-regression minibatch step, batch sharded over 'data'.

    Used for multi-chip linear-model training and as the mesh smoke
    test; the CNN/SGAN steps in train/ follow the same sharding layout.
    """

    def loss_fn(params: Dict[str, jax.Array], X: jax.Array, y: jax.Array):
        logits = X @ params["coef"].T + params["intercept"]
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=1).mean()
        if weight_decay:
            nll = nll + weight_decay * jnp.sum(params["coef"] ** 2)
        return nll

    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    @jax.jit
    def step(params, X, y) -> Tuple[Dict[str, jax.Array], jax.Array]:
        X = jax.lax.with_sharding_constraint(X, batch_sh)
        loss, grads = jax.value_and_grad(loss_fn)(params, X, y)
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        params = jax.lax.with_sharding_constraint(params, rep)
        return params, loss

    return step
