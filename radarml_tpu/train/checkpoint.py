"""Checkpoint/resume for the neural families (orbax-backed).

The reference's persistence is end-of-run pickles plus Keras
best-checkpoint files, with no mid-run restore (SURVEY.md §5). This
module goes further: versioned step checkpoints with retention via
orbax, restoring both model/optimizer state and the step counter so an
interrupted SGAN/CNN run resumes exactly where it stopped.

Trees are stored as plain numpy pytrees; a `meta` dict rides along for
classes/config provenance.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["CheckpointStore"]


def _rebuild(template: Any, raw: Any) -> Any:
    """Re-impose the template's container types onto a restored tree.

    Orbax serializes namedtuples/custom nodes as plain dicts; walking
    the two trees together restores NamedTuple states (SGANState,
    optax optimizer chains) structurally intact.
    """
    if hasattr(template, "_fields"):  # NamedTuple node
        if isinstance(raw, dict):
            vals = {f: _rebuild(getattr(template, f), raw[f])
                    for f in template._fields}
            return type(template)(**vals)
        if isinstance(raw, (list, tuple)):
            vals = [_rebuild(getattr(template, f), r)
                    for f, r in zip(template._fields, raw)]
            return type(template)(*vals)
        return raw
    if isinstance(template, dict) and isinstance(raw, dict):
        return {k: _rebuild(template[k], raw[k]) for k in template}
    if isinstance(template, (list, tuple)) and isinstance(raw, (list, tuple)):
        return type(template)(
            _rebuild(t, r) for t, r in zip(template, raw)
        )
    return raw


class CheckpointStore:
    """Step-indexed checkpoint directory with retention."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, tree: Any, meta: Optional[Dict] = None):
        import orbax.checkpoint as ocp

        self._mgr.save(
            step,
            args=ocp.args.Composite(
                tree=ocp.args.StandardSave(jax.tree.map(np.asarray, tree)),
                meta=ocp.args.JsonSave(meta or {}),
            ),
        )
        self._mgr.wait_until_finished()
        logger.info("checkpoint step %d saved to %s", step, self._dir)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, step: Optional[int] = None, template: Any = None
    ) -> Tuple[int, Any, Dict]:
        """(step, tree, meta); raises FileNotFoundError when empty.

        Pass `template` (a pytree with the target structure, e.g. a
        freshly-initialized state) to restore nested namedtuple /
        optimizer-state structures exactly instead of plain dicts.
        """
        import orbax.checkpoint as ocp

        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self._dir}")
        payload = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                tree=ocp.args.StandardRestore(),
                meta=ocp.args.JsonRestore(),
            ),
        )
        tree = payload["tree"]
        if template is not None:
            tree = _rebuild(template, tree)
        return step, tree, dict(payload["meta"] or {})

    def close(self):
        self._mgr.close()
