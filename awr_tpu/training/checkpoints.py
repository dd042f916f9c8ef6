"""Orbax checkpointing of the full training state.

Reference parity: train.py:165-172 saves {model, optimizer, best_records}
every epoch and resumes all three plus the epoch counter (train.py:80-86,
105).  Here the state is {params, batch_stats, opt_state, step, epoch,
best_records, lr}, saved per epoch under ``<workdir>/ckpt/<epoch>`` with
Orbax (async-capable, TPU-host safe).
"""

from __future__ import annotations

import atexit
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_savable(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._closed = False
        # flush in-flight async saves if the process exits without
        # close() — atexit runs while worker threads can still commit
        atexit.register(self._flush_at_exit)

    def _flush_at_exit(self):
        if not self._closed:
            try:
                self._mgr.wait_until_finished()
            except Exception:
                pass

    def save(self, epoch: int, state: Dict[str, Any],
             block: bool = False):
        """``state`` is a pytree dict; saved under step ``epoch``.

        Saves are ASYNCHRONOUS by default: the pytree is snapshotted to
        host memory synchronously (``_to_savable`` — later mutation of
        the live state cannot corrupt the write), then Orbax commits the
        files on a background thread while the epoch loop keeps
        training.  A crash mid-write leaves only an uncommitted tmp
        step that :meth:`restore`/:meth:`latest_epoch` ignore.  Pass
        ``block=True`` (or call :meth:`wait`) to wait for durability.
        """
        self._mgr.save(
            epoch, args=ocp.args.StandardSave(_to_savable(state))
        )
        if block:
            self._mgr.wait_until_finished()

    def wait(self):
        """Block until every scheduled save has committed to disk."""
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, epoch: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Restore step ``epoch`` (default latest).  ``template`` (a pytree
        of like-shaped arrays) restores into matching dtypes/shapes."""
        self._mgr.wait_until_finished()
        if epoch is None:
            epoch = self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self._mgr.restore(
                epoch,
                args=ocp.args.StandardRestore(_to_savable(template)),
            )
        return self._mgr.restore(epoch)

    def close(self):
        if self._closed:
            return
        self._closed = True
        self._mgr.wait_until_finished()
        self._mgr.close()
        atexit.unregister(self._flush_at_exit)
