"""Determinism helpers (~ misc/utils.py:281-291 set_seed)."""
from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int = 42):
    """Seed host RNGs. Device-side randomness is already explicit
    (jax.random keys threaded through every step)."""
    np.random.seed(seed)
    random.seed(seed)
    print("Determinism: Enabled")
