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
