"""Event-buffer metrics writer.

Reference: ``nerfstudio/utils/writer.py:38-172`` — producers call
``put_scalar / put_dict / put_image / put_time``; buffered running averages
live in ``GLOBAL_BUFFER`` (consumed by the viewer's adaptive resolution,
``viewer_state.py:443-456``); events flush once per step to the registered
writers (terminal / tensorboard / json).
"""
from __future__ import annotations

import enum
import json
import time
from collections import defaultdict, deque
from pathlib import Path
from typing import Any, Dict, List, Optional


class EventName(enum.Enum):
    """``writer.py:43-60``."""
    ITER_TRAIN_TIME = "Train Iter (time)"
    TOTAL_TRAIN_TIME = "Train Total (time)"
    RAYS_PER_SEC = "Rays / Sec"
    CURR_TEST_PSNR = "Test PSNR"
    VIS_RAYS_PER_SEC = "Vis Rays / Sec"
    TEST_RAYS_PER_SEC = "Test Rays / Sec"


GLOBAL_BUFFER: Dict[str, Any] = {"events": {}, "max_buffer_size": 20,
                                 "step": 0}

_EVENTS: List[Dict[str, Any]] = []


def put_scalar(name, scalar, step: int):
    name = name.value if isinstance(name, EventName) else name
    _EVENTS.append({"name": name, "write_type": "scalar",
                    "event": float(scalar), "step": step})


def put_dict(name: str, d: Dict[str, float], step: int):
    _EVENTS.append({"name": name, "write_type": "dict", "event": d,
                    "step": step})


def put_image(name, image, step: int):
    name = name.value if isinstance(name, EventName) else name
    _EVENTS.append({"name": name, "write_type": "image", "event": image,
                    "step": step})


def put_time(name, duration: float, step: int, avg_over_steps: bool = True):
    """Windowed running average in GLOBAL_BUFFER (``writer.py:140-158``)."""
    name = name.value if isinstance(name, EventName) else name
    put_scalar(name, duration, step)
    if avg_over_steps:
        GLOBAL_BUFFER["step"] = step
        curr = GLOBAL_BUFFER["events"].get(
            name, {"buffer": deque(maxlen=GLOBAL_BUFFER["max_buffer_size"]),
                   "avg": 0.0})
        curr["buffer"].append(duration)
        curr["avg"] = sum(curr["buffer"]) / len(curr["buffer"])
        GLOBAL_BUFFER["events"][name] = curr


class Writer:
    def write_scalar(self, name: str, value: float, step: int):
        raise NotImplementedError

    def write_image(self, name: str, image, step: int):
        pass


class LocalWriter(Writer):
    """Terminal stat rows (``writer.py`` LocalWriter, simplified)."""

    def __init__(self, stats_to_track=None, log_every: int = 100):
        self.log_every = log_every
        self._latest: Dict[str, float] = {}

    def write_scalar(self, name, value, step):
        self._latest[name] = value
        if step % self.log_every == 0:
            stats = " ".join(f"{k}={v:.4g}" for k, v in
                             sorted(self._latest.items()))
            print(f"[step {step}] {stats}")


class JsonWriter(Writer):
    def __init__(self, path: Path):
        self.path = Path(path)
        self.rows: List[dict] = []

    def write_scalar(self, name, value, step):
        self.rows.append({"name": name, "value": value, "step": step})

    def flush(self):
        self.path.write_text(json.dumps(self.rows))


class TensorboardWriter(Writer):
    def __init__(self, log_dir: Path):
        from torch.utils.tensorboard import SummaryWriter
        self.tb = SummaryWriter(log_dir=str(log_dir))

    def write_scalar(self, name, value, step):
        self.tb.add_scalar(name, value, step)

    def write_image(self, name, image, step):
        self.tb.add_image(name, image, step, dataformats="HWC")


class WandbWriter(Writer):
    """Weights & Biases event writer (reference ``writer.py`` WandbWriter).

    Import-gated: the ``wandb`` package is optional; construction raises
    ImportError with instructions when it is absent."""

    def __init__(self, log_dir: Path, experiment_name: str = "samnerf_tpu"):
        try:
            import wandb
        except ImportError as e:
            raise ImportError(
                "`--vis wandb` requires the wandb package "
                "(pip install wandb)") from e
        self._wandb = wandb
        wandb.init(project=experiment_name, dir=str(log_dir),
                   reinit=True)

    def write_scalar(self, name, value, step):
        self._wandb.log({name: value}, step=step)

    def write_image(self, name, image, step):
        import numpy as np
        self._wandb.log({name: self._wandb.Image(np.asarray(image))},
                        step=step)


_WRITERS: List[Writer] = []


def setup_local_writer(log_every: int = 100):
    _WRITERS.append(LocalWriter(log_every=log_every))


def setup_event_writer(kind: str, log_dir: Path):
    if kind == "tensorboard":
        _WRITERS.append(TensorboardWriter(log_dir))
    elif kind == "wandb":
        _WRITERS.append(WandbWriter(log_dir))
    elif kind == "json":
        _WRITERS.append(JsonWriter(Path(log_dir) / "metrics.json"))


def finalize():
    """Flush writers that buffer to disk (end of training; reference
    flushes per step via its event loop)."""
    for w in _WRITERS:
        if hasattr(w, "flush"):
            w.flush()


def reset():
    """Flush and drop all registered writers (a new training run in the
    same process must not write into the previous run's sinks)."""
    finalize()
    _WRITERS.clear()


def write_out_storage():
    """Flush queued events to all writers (``writer.py:162-172``)."""
    global _EVENTS
    for ev in _EVENTS:
        for w in _WRITERS:
            if ev["write_type"] == "scalar":
                w.write_scalar(ev["name"], ev["event"], ev["step"])
            elif ev["write_type"] == "dict":
                for k, v in ev["event"].items():
                    w.write_scalar(f"{ev['name']}/{k}", float(v), ev["step"])
            elif ev["write_type"] == "image":
                w.write_image(ev["name"], ev["event"], ev["step"])
    _EVENTS = []
