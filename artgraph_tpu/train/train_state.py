"""Train state pytree: params + BN stats + optimizer state + step."""
from __future__ import annotations

from typing import Any

import flax.struct


@flax.struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any  # {} for models without BatchNorm (ViT)
    opt_state: Any
