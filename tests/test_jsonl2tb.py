"""JSONL -> TensorBoard exporter (tgtc.tools.jsonl2tb): workflow parity
with the reference's tensorboardX scalar logging
(/root/reference/train_style_modules.py:193)."""

import json
import os

import pytest

tb = pytest.importorskip("tensorboard")

from tgtc.tools.jsonl2tb import export_dir


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _read_scalars(run_dir):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(run_dir)
    acc.Reload()
    out = {}
    for tag in acc.Tags()["scalars"]:
        out[tag] = [(e.step, e.value) for e in acc.Scalars(tag)]
    return out


def test_export_and_incremental(tmp_path):
    logdir = str(tmp_path)
    _write_jsonl(os.path.join(logdir, "train.jsonl"),
                 [{"step": 100, "loss": 0.5, "psnr": 20.0},
                  {"step": 200, "loss": 0.25, "psnr": 23.0}])
    _write_jsonl(os.path.join(logdir, "style.jsonl"),
                 [{"step": 10, "loss_coh": 1.5}])

    out = os.path.join(logdir, "tb")
    written = export_dir(logdir, out)
    assert written == {"train": 4, "style": 1}

    scalars = _read_scalars(os.path.join(out, "train"))
    assert scalars["loss"] == [(100, 0.5), (200, 0.25)]
    assert scalars["psnr"] == [(100, 20.0), (200, 23.0)]
    assert _read_scalars(os.path.join(out, "style"))["loss_coh"] == [
        (10, 1.5)]

    # second pass with no new lines: nothing re-written (offset marker)
    assert export_dir(logdir, out) == {"train": 0, "style": 0}

    # append a line -> only the delta exports
    with open(os.path.join(logdir, "train.jsonl"), "a") as f:
        f.write(json.dumps({"step": 300, "loss": 0.1}) + "\n")
    assert export_dir(logdir, out) == {"train": 1, "style": 0}
    scalars = _read_scalars(os.path.join(out, "train"))
    assert (300, pytest.approx(0.1)) == scalars["loss"][-1]


def test_skips_malformed_and_non_scalars(tmp_path):
    logdir = str(tmp_path)
    with open(os.path.join(logdir, "t.jsonl"), "w") as f:
        f.write('{"step": 1, "loss": 1.0, "name": "str-ignored"}\n')
        f.write('{"step": 2, "lo')  # live-run tail: no trailing newline
    out = os.path.join(logdir, "tb")
    assert export_dir(logdir, out) == {"t": 1}

    # the torn line completes later (live writer flushed) -> exports then
    with open(os.path.join(logdir, "t.jsonl"), "a") as f:
        f.write('ss": 2.0}\n')
    assert export_dir(logdir, out) == {"t": 1}
    assert _read_scalars(os.path.join(out, "t"))["loss"] == [
        (1, 1.0), (2, 2.0)]
