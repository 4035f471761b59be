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


def plot_model_png(path: str, params: Any, title: str = "model") -> str:
    """Graphical architecture dump: the Keras `plot_model` analog.

    The reference writes `plot_model(..., show_shapes=True)` PNGs next
    to every checkpoint (reference dnn.py:426-427, sgan.py:750-765).
    Flax modules have no Keras graph object, so this renders the
    parameter tree instead: one box per top-level module (stacked in
    declaration order, which for these sequential CNNs is the data
    path), each listing its parameter leaves with shapes, plus a totals
    footer. Pure matplotlib/Agg — no graphviz dependency.
    """
    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # Group leaves by top-level module, preserving tree order.
    groups: dict = {}
    total = 0
    for p, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in p]
        head = keys[0] if keys else "params"
        tail = "/".join(keys[1:]) or keys[0]
        shape = tuple(getattr(leaf, "shape", ()))
        count = int(np.prod(shape)) if shape else 1
        total += count
        groups.setdefault(head, []).append((tail, shape, count))

    n = len(groups)
    row_h = 0.9
    fig_h = max(2.5, 1.2 + n * row_h + 0.6)
    fig, ax = plt.subplots(figsize=(7.5, fig_h))
    ax.set_axis_off()
    ax.set_xlim(0, 1)
    ax.set_ylim(0, n * row_h + 1.0)

    y = n * row_h + 0.55
    ax.text(0.5, y, title, ha="center", va="center",
            fontsize=11, fontweight="bold")

    for i, (name, leaves) in enumerate(groups.items()):
        top = (n - i) * row_h
        g_count = sum(c for _, _, c in leaves)
        body = "   ".join(
            f"{t}: {s}" for t, s, _ in leaves[:4]
        ) + ("   …" if len(leaves) > 4 else "")
        ax.add_patch(plt.Rectangle(
            (0.06, top - 0.72), 0.88, 0.62,
            facecolor="#eef3fb", edgecolor="#35507a", linewidth=1.2,
        ))
        ax.text(0.09, top - 0.28, name, fontsize=10, fontweight="bold",
                va="center")
        ax.text(0.92, top - 0.28, f"{g_count:,} params", fontsize=8,
                va="center", ha="right", color="#555555")
        ax.text(0.09, top - 0.56, body, fontsize=7.5, va="center",
                family="monospace", color="#333333")
        if i < n - 1:
            ax.annotate(
                "", xy=(0.5, top - row_h - 0.10 + 0.0),
                xytext=(0.5, top - 0.72),
                arrowprops=dict(arrowstyle="->", color="#35507a", lw=1.2),
            )

    ax.text(0.5, 0.12, f"total parameters: {total:,}",
            ha="center", fontsize=9, color="#333333")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path
