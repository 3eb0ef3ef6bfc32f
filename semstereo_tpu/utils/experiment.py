"""Experiment utilities: pytree scalar conversion, NaN-tolerant meters,
TensorBoard writers, stdout tee.

Re-designs /root/reference/utils/experiment.py (tree helpers :13-53, TB
writers :61-99, meters :122-217) and the Logger1 stdout tee
(/root/reference/main_us3d.py:28-47).
"""

from __future__ import annotations

import copy
import math
import sys
from typing import Any

import jax
import numpy as np


def tensor2float(tree):
    """Recursively convert array leaves (jax/np scalars) to python floats."""
    return jax.tree_util.tree_map(
        lambda x: float(x) if hasattr(x, "__float__") or np.isscalar(x) else x, tree
    )


def tensor2numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class AverageMeter:
    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, x: float):
        self.sum += x
        self.count += 1

    def mean(self) -> float:
        return self.sum / max(self.count, 1)


class AverageMeterDict:
    """NaN-skipping batch-mean accumulator over dicts of floats / lists of
    floats (reference AverageMeterDict, experiment.py:136-173)."""

    def __init__(self):
        self.data: dict | None = None
        self.count = 0

    def update(self, x: dict):
        self.count += 1
        if self.data is None:
            self.data = copy.deepcopy(x)
            # NaNs in the very first update must not poison the sum
            for k, v in self.data.items():
                if isinstance(v, (list, tuple)):
                    self.data[k] = [0.0 if math.isnan(e) else e for e in v]
                elif math.isnan(v):
                    self.data[k] = 0.0
            return
        for k, v in x.items():
            if isinstance(v, (list, tuple)):
                for i, e in enumerate(v):
                    if not math.isnan(e):
                        self.data[k][i] += e
            elif not math.isnan(v):
                self.data[k] += v

    def mean(self) -> dict:
        if self.data is None:
            return {}
        return jax.tree_util.tree_map(lambda v: v / float(self.count), self.data)


class AverageMeterDictPerKey:
    """NaN-aware per-key-count averaging (reference AverageMeterDict2,
    experiment.py:175-217): keys that were NaN in some batches average over
    only the batches where they were finite."""

    def __init__(self):
        self.sums: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    def update(self, x: dict):
        for k, v in x.items():
            vals = v if isinstance(v, (list, tuple)) else [v]
            for e in vals:
                if not math.isnan(e):
                    self.sums[k] = self.sums.get(k, 0.0) + e
                    self.counts[k] = self.counts.get(k, 0) + 1

    def mean(self) -> dict:
        return {k: self.sums[k] / self.counts[k] for k in self.sums if self.counts.get(k)}


def save_scalars(writer, mode_tag: str, scalar_dict: dict, global_step: int):
    """Per-index scalar tags, reference save_scalars layout."""
    scalar_dict = tensor2float(scalar_dict)
    for tag, values in scalar_dict.items():
        if not isinstance(values, (list, tuple)):
            values = [values]
        for idx, value in enumerate(values):
            writer.add_scalar(f"{mode_tag}/{tag}_{idx}", value, global_step)


def save_images(writer, mode_tag: str, images_dict: dict, global_step: int):
    """First-sample normalized image grids (reference save_images)."""
    images_dict = tensor2numpy(images_dict)
    for tag, values in images_dict.items():
        if not isinstance(values, (list, tuple)):
            values = [values]
        for idx, value in enumerate(values):
            img = np.asarray(value)
            if img.ndim == 3:  # [B,H,W] -> [B,1,H,W]
                img = img[:, None]
            img = img[:1].astype(np.float32)
            lo, hi = img.min(), img.max()
            img = (img - lo) / max(hi - lo, 1e-12)
            name = f"{mode_tag}/{tag}" + (f"_{idx}" if len(values) > 1 else "")
            writer.add_image(name, img[0], global_step)


class TeeLogger:
    """stdout tee to a logfile (reference Logger1)."""

    def __init__(self, filename: str, stream=None):
        self.terminal = stream or sys.stdout
        self.filename = filename

    def write(self, message: str):
        self.terminal.write(message)
        with open(self.filename, "a+") as f:
            f.write(message)

    def flush(self):
        self.terminal.flush()
