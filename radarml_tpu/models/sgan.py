"""Semi-supervised GAN family: generator, two-headed discriminator.

JAX/flax re-design of the reference's SGAN graphs (sgan.py:57-235):

* Generator (sgan.py:57-122): a 100-d latent feeds three independent
  per-projection branches — Dense(8·8·128)+ReLU → reshape (8,8,128) →
  4× [ConvTranspose(128, 4×4, s2, SAME) + BN + ReLU] up to 128×128 →
  Conv(1, 7×7, SAME, tanh). Outputs (xz, yz, xy), each (B,128,128,1)
  in [-1, 1].
* Discriminator (sgan.py:125-217): per-projection trunk of
  Conv(128→64→32, 3×3, s2, SAME)+BN+LeakyReLU(0.2); channel-concat at
  16×16; flatten; 2× [Dense(64)+BN+LeakyReLU+Dropout(0.5)]; Dense(k)
  logits. Two heads share those logits: the supervised classifier is
  softmax over them, and the unsupervised real/fake head is the
  Salimans-style custom activation Z/(Z+1) with Z = Σ exp(logits)
  (sgan.py:126-131).

Both use RandomNormal(0, 0.02) kernel init and Keras BatchNorm
semantics (momentum 0.99, ε=1e-3). The GAN composite's freeze rule —
everything in the discriminator frozen *except* BatchNorm
(sgan.py:220-235) — lives in the trainer's gradient mask
(train/sgan_trainer.py), the functional equivalent of Keras'
layer.trainable flags.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "LATENT_DIM",
    "SGAN_RESCALE",
    "Generator",
    "Discriminator",
    "custom_activation",
    "d_head",
    "c_head",
]

LATENT_DIM = 100  # sgan.py:800-810 default
SGAN_RESCALE: Tuple[int, int] = (128, 128)  # sgan.py:39

_init = nn.initializers.normal(stddev=0.02)


def custom_activation(logits: jax.Array) -> jax.Array:
    """Z/(Z+1), Z = Σ exp(logits): P(real) from class logits.

    Numerically-stable form via log-sum-exp: Z/(Z+1) = sigmoid(lse).
    """
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    return jax.nn.sigmoid(lse)


class _GenBranch(nn.Module):
    """One per-projection upsampling branch (sgan.py:57-92).

    n_upsamples=4 gives the reference's 8→128 pyramid; smaller values
    target reduced resolutions (used by tests and low-res arenas).
    """

    n_upsamples: int = 4
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, z: jax.Array, train: bool) -> jax.Array:
        x = nn.Dense(8 * 8 * 128, kernel_init=_init)(z)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], 8, 8, 128))
        for _ in range(self.n_upsamples):  # 8→16→…→8·2ⁿ
            x = nn.ConvTranspose(
                128, (4, 4), strides=(2, 2), padding="SAME", kernel_init=_init
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-3,
            )(x)
            x = nn.relu(x)
        x = nn.Conv(1, (7, 7), padding="SAME", kernel_init=_init)(x)
        return jnp.tanh(x)


class Generator(nn.Module):
    """Latent → (xz, yz, xy) projections, each (B, S, S, 1) with
    S = 8·2^n_upsamples (128 in the reference)."""

    n_upsamples: int = 4
    bn_momentum: float = 0.99

    @property
    def out_size(self) -> int:
        return 8 * (2 ** self.n_upsamples)

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True):
        m = self.bn_momentum
        xz = _GenBranch(self.n_upsamples, m, name="xz")(z, train)
        yz = _GenBranch(self.n_upsamples, m, name="yz")(z, train)
        xy = _GenBranch(self.n_upsamples, m, name="xy")(z, train)
        return xz, yz, xy


class _DiscBranch(nn.Module):
    """One per-projection downsampling trunk (sgan.py:136-157)."""

    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        for feats in (128, 64, 32):
            x = nn.Conv(
                feats, (3, 3), strides=(2, 2), padding="SAME", kernel_init=_init
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-3,
            )(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        return x


class Discriminator(nn.Module):
    """Shared trunk producing the k class logits both heads consume."""

    n_classes: int = 3
    dense_width: int = 64
    dropout_rate: float = 0.5
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, views, train: bool = True) -> jax.Array:
        xz, yz, xy = views
        bxz = _DiscBranch(self.bn_momentum, name="xz")(xz, train)
        byz = _DiscBranch(self.bn_momentum, name="yz")(yz, train)
        bxy = _DiscBranch(self.bn_momentum, name="xy")(xy, train)
        x = jnp.concatenate([bxz, byz, bxy], axis=-1)
        x = x.reshape((x.shape[0], -1))
        for _ in range(2):
            x = nn.Dense(self.dense_width, kernel_init=_init)(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-3,
            )(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.n_classes, kernel_init=_init)(x)


def c_head(logits: jax.Array) -> jax.Array:
    """Supervised head: class probabilities (sgan.py:203-209)."""
    return jax.nn.softmax(logits, axis=-1)


def d_head(logits: jax.Array) -> jax.Array:
    """Unsupervised head: P(real) (sgan.py:211-217)."""
    return custom_activation(logits)
