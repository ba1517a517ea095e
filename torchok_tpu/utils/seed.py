"""Global seeding (reference uses Lightning seed_everything)."""
from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int, workers: bool = True) -> int:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    os.environ["TORCHOK_TPU_SEED"] = str(seed)
    return seed
