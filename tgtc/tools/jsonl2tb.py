"""JSONL → TensorBoard exporter.

The reference logs training scalars to tensorboardX
(/root/reference/train_style_modules.py:193,237-238,495-497;
/root/reference/trans_train.py:111,197-201); tgtc logs JSONL
(tgtc.utils.logging.MetricsLogger). This tool closes the workflow gap for
migrating reference users: point it at an experiment log directory and it
emits standard TensorBoard event files — one run per ``*.jsonl`` stream,
one scalar tag per metric key.

Usage::

    python -m tgtc.tools.jsonl2tb <logdir> [--out <logdir>/tb] [--watch N]

``--watch N`` re-exports every N seconds (live dashboards during a run);
exports are incremental per invocation (the event writer appends only
lines past the last exported step of each run).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time
from typing import Dict


def export_dir(logdir: str, out: str) -> Dict[str, int]:
    """Export every ``*.jsonl`` under ``logdir`` into TB runs under
    ``out``. Returns {run_name: n_scalars_written}."""
    from torch.utils.tensorboard import SummaryWriter

    written: Dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(logdir, "*.jsonl"))):
        run = os.path.splitext(os.path.basename(path))[0]
        run_dir = os.path.join(out, run)
        marker = os.path.join(run_dir, ".jsonl2tb_offset")
        offset = 0
        if os.path.exists(marker):
            with open(marker) as f:
                offset = int(f.read().strip() or 0)
        n = 0
        writer = None
        with open(path) as f:
            f.seek(offset)
            while True:
                pos = f.tell()
                line = f.readline()
                if not line:
                    break
                if not line.endswith("\n"):
                    # torn tail of a LIVE run (writer mid-line): don't
                    # consume it — the completed line exports next pass
                    f.seek(pos)
                    break
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # malformed full line: skip permanently
                step = int(rec.pop("step", 0))
                if writer is None:  # lazy: no event file for empty deltas
                    writer = SummaryWriter(run_dir)
                for key, val in rec.items():
                    if isinstance(val, (int, float)):
                        writer.add_scalar(key, val, global_step=step)
                        n += 1
            offset = f.tell()
        if writer is not None:
            writer.close()
            with open(marker, "w") as f:
                f.write(str(offset))
        written[run] = n
    return written


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("logdir", help="experiment log directory "
                                   "(contains *.jsonl metric streams)")
    ap.add_argument("--out", default=None,
                    help="TB output directory (default <logdir>/tb)")
    ap.add_argument("--watch", type=float, default=0.0,
                    help="re-export every N seconds until interrupted")
    args = ap.parse_args(argv)
    out = args.out or os.path.join(args.logdir, "tb")
    while True:
        written = export_dir(args.logdir, out)
        total = sum(written.values())
        print(f"[jsonl2tb] wrote {total} scalars across "
              f"{len(written)} run(s) -> {out}", flush=True)
        if not args.watch:
            return 0
        time.sleep(args.watch)


if __name__ == "__main__":
    raise SystemExit(main())
