"""Multi-host (DCN) runtime wiring.

The reference carries a dead multi-process init path that discovers rank
from the environment and calls ``torch.distributed.init_process_group``
(`/root/reference/misc.py:157-179`). The TPU-native equivalent is
``jax.distributed.initialize``: after it, ``jax.devices()`` spans every
process, one global ``Mesh`` covers ICI+DCN, and XLA emits the
collectives — no NCCL analog is needed (SURVEY.md §2.6).

Environment discovery (first match wins, mirroring the reference's
env-var → SLURM cascade):

1. ``TGTC_COORDINATOR`` + ``TGTC_NUM_PROCESSES`` + ``TGTC_PROCESS_ID`` —
   explicit, works anywhere (the 2-process CPU test uses these).
2. ``MASTER_ADDR``/``MASTER_PORT`` + ``WORLD_SIZE`` + ``RANK`` — the
   torchrun convention the reference reads (`misc.py:159-163`).
3. ``SLURM_PROCID``/``SLURM_NTASKS`` + ``TGTC_COORDINATOR`` — the SLURM
   branch (`misc.py:164-167`); the coordinator address still has to come
   from somewhere, so it stays explicit.
4. ``TGTC_DISTRIBUTED=1`` with none of the above: defer to
   ``jax.distributed.initialize()``'s own auto-detection (TPU pods / GKE
   publish cluster metadata jax reads natively).

Batch feeding is process-aware by construction: datasets are device_put
with a *replicated* global sharding (every process holds the same host
copy and supplies its addressable shards), while the per-step batch
gather happens inside jit where the ``data``-axis sharding constraint
splits rays across all chips of all processes.
"""

from __future__ import annotations

import os
from typing import Any, Mapping, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def discover_cluster_env(
    env: Optional[Mapping[str, str]] = None,
) -> Optional[dict]:
    """Return ``jax.distributed.initialize`` kwargs from the environment,
    or None when no explicit cluster spec is present."""
    e = os.environ if env is None else env
    if all(k in e for k in
           ("TGTC_COORDINATOR", "TGTC_NUM_PROCESSES", "TGTC_PROCESS_ID")):
        return dict(
            coordinator_address=e["TGTC_COORDINATOR"],
            num_processes=int(e["TGTC_NUM_PROCESSES"]),
            process_id=int(e["TGTC_PROCESS_ID"]),
        )
    if all(k in e for k in ("MASTER_ADDR", "MASTER_PORT", "WORLD_SIZE",
                            "RANK")):
        return dict(
            coordinator_address=f"{e['MASTER_ADDR']}:{e['MASTER_PORT']}",
            num_processes=int(e["WORLD_SIZE"]),
            process_id=int(e["RANK"]),
        )
    if all(k in e for k in ("SLURM_PROCID", "SLURM_NTASKS",
                            "TGTC_COORDINATOR")):
        return dict(
            coordinator_address=e["TGTC_COORDINATOR"],
            num_processes=int(e["SLURM_NTASKS"]),
            process_id=int(e["SLURM_PROCID"]),
        )
    return None


def maybe_initialize_distributed(
    env: Optional[Mapping[str, str]] = None,
) -> bool:
    """Initialize the multi-host runtime when the environment asks for it.

    Returns True when ``jax.distributed.initialize`` was called. Safe to
    call unconditionally at process start (before any backend use): a
    plain single-process launch is a no-op.
    """
    e = os.environ if env is None else env
    spec = discover_cluster_env(e)
    if spec is None and e.get("TGTC_DISTRIBUTED") != "1":
        return False
    # idempotent guard for re-entrant mains (must not touch the backend)
    try:
        if jax.distributed.global_state.client is not None:
            return False
    except AttributeError:  # pragma: no cover - jax internals moved
        pass
    # Multi-process CPU collectives need gloo (the CPU-mesh test backend;
    # harmless elsewhere — TPU uses its own ICI/DCN transport).
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # pragma: no cover - older jax spells it differently
        pass
    if spec is not None:
        jax.distributed.initialize(**spec)
    else:
        jax.distributed.initialize()  # TPU-pod auto detection
    return True


def is_main_process() -> bool:
    """True on the process that owns host-side IO (logs, checkpoints,
    PNG/video writes) — process 0, every process in single-host runs."""
    return jax.process_index() == 0


def replicate_to_mesh(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree replicated over the global mesh. Required under
    multi-process: jit inputs must be globally-addressable arrays, and the
    dataset tensors are logically identical on every process."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
