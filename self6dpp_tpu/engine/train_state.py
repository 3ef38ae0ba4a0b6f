"""Train state PyTree + EMA, replacing the reference's checkpointer-held
model/optimizer/scheduler triple (core/utils/my_checkpoint.py, ModelEMA at
lib/torch_utils/torch_utils.py:225-260).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.struct
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any            # mean-teacher weights (None if disabled)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)

    def update_ema(self, decay_fn=None):
        """Exp-ramp EMA matching ModelEMA: d = decay * (1 - exp(-step/2000))."""
        if self.ema_params is None:
            return self
        d = decay_fn(self.step) if decay_fn is not None else 0.999
        new_ema = jax.tree.map(
            lambda e, p: e * d + (1.0 - d) * p, self.ema_params, self.params)
        return self.replace(ema_params=new_ema)


def ema_decay_schedule(base_decay: float, ramp_iters: int = 2000):
    def fn(step):
        return base_decay * (1.0 - jnp.exp(-step.astype(jnp.float32) / ramp_iters))
    return fn


def create_train_state(params, batch_stats, tx, with_ema: bool = True) -> TrainState:
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        # real copies — aliasing params would break buffer donation
        ema_params=jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        if with_ema else None,
        tx=tx,
    )
