"""Experiment metrics logging — the wandb/TensorBoard equivalent.

The reference logs through wandb (`DG-SCT/AVE/main_trans.py:181-182,299-300`;
AVS `train.py:72-74,333-334`) and TensorBoard (`AVVP/main.py:7`;
`grounding_gen/main_grd_gen.py:49`). Neither service fits an air-gapped TPU
pod, so the primary sink here is an append-only JSONL stream (one event per
line: step, wall time, scalars) that any dashboard can tail; a TensorBoard
event-file sink is layered on when `tensorboard` is importable.

Usage:
    logger = MetricsLogger(run_dir, run_name="ave", config=vars(args))
    logger.log({"loss": 0.31, "acc": 71.2}, step=120)
    logger.close()
"""
from __future__ import annotations

import json
import os
import time
from typing import Mapping, Optional


def _to_scalar(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


def snapshot_run(run_dir: str, *, package_root: Optional[str] = None,
                 config: Optional[Mapping] = None) -> str:
    """Reproducibility snapshot — the `Recorder` equivalent
    (`pretrain/utils/Recorder.py:5-88`): copy the framework source into
    `<run_dir>/code/` (py/cpp files only, git hash recorded when available)
    and dump the run config, so any experiment directory is self-describing."""
    import shutil
    import subprocess

    root = package_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code_dir = os.path.join(run_dir, "code")
    os.makedirs(code_dir, exist_ok=True)
    for dirpath, dirnames, files in os.walk(root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        rel = os.path.relpath(dirpath, root)
        for name in files:
            if name.endswith((".py", ".cpp", ".h")):
                dst = os.path.join(code_dir, rel, name)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copyfile(os.path.join(dirpath, name), dst)
    meta = {"package_root": root}
    try:
        meta["git_rev"] = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=root, text=True,
            capture_output=True, timeout=10).stdout.strip()
    except Exception:
        pass
    if config is not None:
        meta["config"] = {k: _to_scalar(v) for k, v in dict(config).items()}
    with open(os.path.join(run_dir, "run_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return code_dir


class MetricsLogger:
    """JSONL (always) + TensorBoard (best-effort) scalar logger."""

    def __init__(self, run_dir: Optional[str], run_name: str = "run",
                 config: Optional[Mapping] = None, tensorboard: bool = True):
        self.run_dir = run_dir
        self._fh = None
        self._tb = None
        self._t0 = time.time()
        if run_dir is None:
            return
        os.makedirs(run_dir, exist_ok=True)
        self._fh = open(os.path.join(run_dir, f"{run_name}.metrics.jsonl"), "a")
        if config is not None:
            self._emit({"event": "config",
                        "config": {k: _to_scalar(v) for k, v in dict(config).items()}})
        if tensorboard:
            try:  # tensorboard is baked into the image; torch SummaryWriter is not
                from tensorboard.summary.writer.event_file_writer import EventFileWriter
                from tensorboard.compat.proto.summary_pb2 import Summary
                from tensorboard.compat.proto.event_pb2 import Event
                self._tb = EventFileWriter(os.path.join(run_dir, "tb", run_name))
                self._Summary, self._Event = Summary, Event
            except Exception:
                self._tb = None

    def _emit(self, rec: dict):
        if self._fh is None:
            return
        rec.setdefault("time", round(time.time() - self._t0, 3))
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def log(self, scalars: Mapping[str, float], step: int, prefix: str = ""):
        vals = {prefix + k: _to_scalar(v) for k, v in scalars.items()}
        self._emit({"event": "scalars", "step": int(step), **vals})
        if self._tb is not None:
            ev = self._Event(
                step=int(step), wall_time=time.time(),
                summary=self._Summary(value=[
                    self._Summary.Value(tag=k, simple_value=v)
                    for k, v in vals.items() if isinstance(v, float)]))
            self._tb.add_event(ev)

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
