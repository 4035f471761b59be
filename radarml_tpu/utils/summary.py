"""Model architecture/parameter summaries.

The reference dumps Keras `plot_model` PNGs next to its checkpoints
(reference dnn.py:426-427, sgan.py:750-765) so a run's artifact
directory documents the exact architecture that produced it. The
JAX-native equivalent: a text tree of every parameter leaf with shape,
dtype and count, plus totals — written by the train CLIs alongside the
model pickle.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def model_summary(params: Any, title: str = "model") -> str:
    """Render a flax/pytree parameter tree as an aligned text table."""
    import jax

    leaves = jax.tree_util.tree_leaves_with_path(params)
    rows = []
    total = 0
    for path, leaf in leaves:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        shape = tuple(getattr(leaf, "shape", ()))
        dtype = str(getattr(leaf, "dtype", type(leaf).__name__))
        count = int(np.prod(shape)) if shape else 1
        total += count
        rows.append((name, shape, dtype, count))

    width = max([len(r[0]) for r in rows] + [len("parameter")])
    lines = [
        f"# {title}",
        "",
        f"{'parameter'.ljust(width)}  {'shape'.ljust(18)}  {'dtype'.ljust(10)}  params",
        "-" * (width + 40),
    ]
    for name, shape, dtype, count in rows:
        lines.append(
            f"{name.ljust(width)}  {str(shape).ljust(18)}  "
            f"{dtype.ljust(10)}  {count:,}"
        )
    lines += [
        "-" * (width + 40),
        f"total parameters: {total:,} "
        f"({total * 4 / 1024:,.1f} KiB at f32)",
        "",
    ]
    return "\n".join(lines)


def write_model_summary(path: str, params: Any, title: str = "model") -> str:
    """Write `model_summary` to `path`; returns the rendered text."""
    text = model_summary(params, title)
    with open(path, "w") as fp:
        fp.write(text)
    return text
