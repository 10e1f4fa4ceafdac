"""SmartTimer (reference STEM-GNN/dataset/gp/utils/utils.py:17-46) plus a
jax-aware variant that blocks on device work before stamping."""

from __future__ import annotations

import time

import jax


class SmartTimer:
    """Accumulating named wall-clock probe."""

    def __init__(self, verbose: bool = True):
        self.verbose = verbose
        self.last = time.time()
        self.records = {}

    def record(self):
        self.last = time.time()

    def cal_and_update(self, name: str):
        now = time.time()
        delta = now - self.last
        self.records[name] = self.records.get(name, 0.0) + delta
        if self.verbose:
            print(name, f"{delta:.4f}s")
        self.last = now
        return delta


class DeviceTimer(SmartTimer):
    """Blocks on outstanding device work before stamping — wall-clock probes
    around async jax dispatch are meaningless otherwise."""

    def __init__(self, verbose: bool = True, sync_value=None):
        super().__init__(verbose)
        self._sync_value = sync_value

    def cal_and_update(self, name: str, value=None):
        v = value if value is not None else self._sync_value
        if v is not None:
            jax.block_until_ready(v)
        return super().cal_and_update(name)
