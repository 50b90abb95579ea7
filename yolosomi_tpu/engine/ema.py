"""Model EMA + early stopping (reference: utils/torch_utils.py:292-349).

The reference EMAs every floating entry of the state dict — parameters
AND BatchNorm running stats (ModelEMA.update, torch_utils.py:341-348);
`ema_variables` therefore tracks both trees. Decay ramps as
0.9999 * (1 - exp(-updates/2000)) so early updates follow the model
closely (torch_utils.py:327).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    variables: Any  # {'params': ..., 'batch_stats': ...} pytree
    updates: jax.Array  # int32 counter


def ema_init(variables) -> EMAState:
    # materialize copies: EMA leaves must not alias the live params, or
    # buffer donation in the train step would donate the same buffer twice
    return EMAState(
        variables=jax.tree_util.tree_map(jnp.copy, variables),
        updates=jnp.zeros((), jnp.int32),
    )


def ema_update(state: EMAState, variables, decay: float = 0.9999, tau: float = 2000.0) -> EMAState:
    """One EMA step (pure; call inside the jitted train step)."""
    updates = state.updates + 1
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))

    def blend(e, v):
        if jnp.issubdtype(jnp.asarray(e).dtype, jnp.floating):
            return d * e + (1.0 - d) * v
        return v

    new_vars = jax.tree_util.tree_map(blend, state.variables, variables)
    return EMAState(new_vars, updates)


class EarlyStopping:
    """Patience-on-fitness stopper (reference: torch_utils.py:292-312)."""

    def __init__(self, patience: int = 30):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        stop = (epoch - self.best_epoch) >= self.patience
        return stop
