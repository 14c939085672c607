"""Checkpointing via orbax.

Replaces the reference's filename-substring checkpoint discovery and torch
``.tar`` saves (/root/reference/train_tgtcs.py:56-82,284-305) with an orbax
CheckpointManager: explicit step metadata, atomic saves, retention policy
(``max_to_keep`` = reference ``ckp_num``), and pytree-native restore.
"""

from __future__ import annotations

import os
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, List, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for a single state pytree."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        opts = dict(max_to_keep=max_to_keep, create=True)
        if jax.process_count() > 1:
            # Multi-host: train states are fully replicated, so process 0's
            # host copy is the global truth — writes are gated to it (see
            # save/save_device_async) and every process's manager is scoped
            # to ITSELF so orbax never barriers across processes (a save
            # called on one process only would otherwise deadlock the
            # cross-process sync). Restores are plain reads of the shared
            # log directory.
            pi = jax.process_index()
            opts["multiprocessing_options"] = (
                ocp.options.MultiprocessingOptions(
                    primary_host=pi, active_processes={pi},
                    barrier_sync_key_prefix=f"tgtc_p{pi}",
                )
            )
            # orbax refuses create=True with active_processes; the root
            # directory is already created by the makedirs above
            opts["create"] = False
        self._mgr = ocp.CheckpointManager(
            self._dir, options=ocp.CheckpointManagerOptions(**opts)
        )
        self._fetcher: Optional[ThreadPoolExecutor] = None
        self._pending: List[Future] = []

    def save(self, step: int, state: Any, force: bool = False,
             wait: bool = False) -> None:
        """Start an (atomic) save of ``state`` at ``step``.

        By default the disk write happens on orbax's background thread and
        this returns immediately — in-loop saves no longer stall the async
        dispatch pipeline (measured ~3.9 s/save on Phase A, 240 saves per
        reference schedule). orbax writes to a temp dir and renames on
        finalize, so a crash mid-write never leaves a restorable partial
        checkpoint. Pass ``wait=True`` (or call :meth:`wait`) for the final
        save of a phase so process exit cannot race the write.

        Multi-host: only process 0 writes (states are replicated, so its
        copy is the global truth); other processes no-op. Restores read the
        shared log directory from every process.
        """
        if jax.process_index() != 0:
            return
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        if wait:
            self._mgr.wait_until_finished()

    def save_device_async(self, step: int, state: Any,
                          wait: bool = False) -> None:
        """Save ``state`` (DEVICE arrays) without blocking the train loop.

        ``jax.device_get`` of a full train state costs ~6.7 s through the
        tunneled TPU's D2H path (measured, 14 MB Phase-A state) — in-loop
        it was most of the gap between Phase A's wall clock and its device
        rate. This moves the fetch onto a background thread: the caller
        passes a state no later computation donates (use a jitted
        non-donating ``jnp.copy`` snapshot, ~10 ms), the worker fetches it
        and hands it to orbax's own async save. A single worker preserves
        orbax's increasing-step order; at most 2 fetches are pending
        (backpressure blocks on the oldest) so snapshots can't pile up in
        HBM if the tunnel is slower than the checkpoint cadence.
        """
        if jax.process_index() != 0:
            return
        self._drain_done()
        if self._fetcher is None:
            self._fetcher = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="tgtc-ckpt-fetch"
            )
        while len(self._pending) >= 2:  # backpressure, keep cadence
            self._pending.pop(0).result()

        def job() -> None:
            host = jax.device_get(state)
            self._mgr.save(step, args=ocp.args.StandardSave(host))

        self._pending.append(self._fetcher.submit(job))
        if wait:
            self.wait()

    def _drain_done(self) -> None:
        """Drop finished fetch jobs, re-raising any background failure."""
        while self._pending and self._pending[0].done():
            self._pending.pop(0).result()

    def wait(self) -> None:
        """Block until all in-flight async saves are finalized."""
        while self._pending:
            self._pending.pop(0).result()
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self.wait()
        return self._mgr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_like`` (an abstract or
        concrete pytree of the same shape)."""
        self.wait()
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_like)
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(target)
        )

    def close(self) -> None:
        self.wait()
        if self._fetcher is not None:
            self._fetcher.shutdown(wait=True)
            self._fetcher = None
        self._mgr.close()
