"""Training state container (params + batch stats + optimizer state)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray          # data-iteration counter
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}
