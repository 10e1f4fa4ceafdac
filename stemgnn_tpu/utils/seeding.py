"""Seeding utilities (STEM-GNN/utils/others.py:73-81 analog).

JAX randomness is already explicit (keys); this seeds the host-side numpy /
python RNGs used by samplers and split generation.
"""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int):
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
