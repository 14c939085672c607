"""CLI entry point.

Usage parity with the reference (/root/reference/README.md:25-33):

    python -m tgtc.cli --config configs/fern.txt
    python -m tgtc.cli --config configs/fern.txt --render_valid_style
    python -m tgtc.cli --config configs/fern.txt --render_train_style

All reference flags (see tgtc.config.Config) are accepted; config files in
the reference's ``key = value`` format load unchanged.
"""

from __future__ import annotations

import sys
from typing import List, Optional

from tgtc.config import load_config
from tgtc.train.pipeline import Pipeline


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the full-size StyTrans train step
    takes minutes to compile; caching makes every later process start warm.
    Opt out with TGTC_NO_COMPILE_CACHE=1 or point TGTC_COMPILE_CACHE at a
    different directory."""
    import os

    if os.environ.get("TGTC_NO_COMPILE_CACHE") == "1":
        return
    cache_dir = os.environ.get(
        "TGTC_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tgtc_jax"),
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"[cache] compilation cache disabled: {e}", flush=True)


def main(argv: Optional[List[str]] = None) -> int:
    # multi-host: one global mesh over all processes; coordinator/rank
    # discovered from the cluster env (TGTC_*/torchrun/SLURM conventions —
    # tgtc/parallel/distributed.py; the reference's dead analog is
    # /root/reference/misc.py:157-179). No-op for single-process launches.
    from tgtc.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    cfg = load_config(argv)
    if cfg.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    _enable_compilation_cache()
    pipe = Pipeline(cfg)
    try:
        pipe.run()
    finally:
        pipe.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
