"""Runtime performance recorder (ref `utils/monitor.py::Recorder`)."""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict


class Recorder:
    def __init__(self, device_id: int = 0):
        self.device_id = device_id
        self.means = defaultdict(float)
        self.counts = defaultdict(int)
        self.max_mem_gb = 0.0
        self.fps = 0.0

    def update_mean(self, name: str, value: float, weight: int = 1):
        """Running mean (ref monitor.py:16-24)."""
        c = self.counts[name]
        self.means[name] = (self.means[name] * c + value * weight) / (c + weight)
        self.counts[name] += weight

    def watch_gpu(self):
        """Peak device memory (best-effort via jax)."""
        try:
            import jax
            stats = jax.devices()[0].memory_stats()
            if stats:
                self.max_mem_gb = max(
                    self.max_mem_gb,
                    stats.get("peak_bytes_in_use", 0) / (1 << 30))
        except Exception:
            pass

    def cal_fps(self):
        """fps = 1 / mean mapping time (ref monitor.py:46-50)."""
        if self.means.get("mapping", 0) > 0:
            self.fps = 1.0 / self.means["mapping"]
        return self.fps

    def save(self, save_path: str):
        os.makedirs(save_path, exist_ok=True)
        data = {"fps": self.fps, "max_mem_GB": self.max_mem_gb}
        data.update({f"mean_{k}_s": v for k, v in self.means.items()})
        with open(os.path.join(save_path, "performance.json"), "w") as f:
            json.dump(data, f, indent=2)
        return data


class ScalarLogger:
    """Training-curve logger (the reference's `use_tensorboard` slot,
    mapper SummaryWriter usage). Writes append-only JSONL — one
    `{"step": n, "tag": ..., "value": ...}` per line — which any plotting
    tool can consume; mirrors to TensorBoard when the package is present."""

    def __init__(self, save_path: str, enabled: bool = True):
        self.enabled = enabled
        self._f = None
        self._tb = None
        if not enabled:
            return
        os.makedirs(save_path, exist_ok=True)
        self._f = open(os.path.join(save_path, "scalars.jsonl"), "a")
        try:  # optional mirror
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(os.path.join(save_path, "tb"))
        except Exception:
            self._tb = None

    def log(self, step: int, tag: str, value: float):
        if not self.enabled or self._f is None:
            return
        self._f.write(json.dumps(
            {"step": int(step), "tag": tag, "value": float(value),
             "t": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def log_dict(self, step: int, values: dict, prefix: str = ""):
        for k, v in values.items():
            self.log(step, prefix + k, v)
        self.flush()

    def flush(self):
        if self._f is not None:
            self._f.flush()

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None
        if self._tb is not None:
            self._tb.close()
