"""Adam optimizer for the Gaussian parameter groups.

Hand-rolled (rather than optax) so densification can perform the reference's
"optimizer state surgery" (gaussian_model.py:561-637) as plain array ops on
the (m, v) moments stored in GaussianState.

Semantics match torch.optim.Adam(eps=1e-15) as configured at
gaussian_model.py:338-353: bias-corrected moments, eps added *outside* the
square root, one shared step count (torch keeps per-tensor steps, but all
groups step together every iteration so a scalar is equivalent; new entries
inherit the global bias correction exactly like torch's cat surgery).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from radegs_tpu.models.gaussian_model import GaussianParams, GaussianState

BETA1, BETA2, EPS = 0.9, 0.999, 1e-15


@struct.dataclass
class GroupLRs:
    """Per-group learning rates (OptimizationParams, arguments/__init__.py:79-88)."""

    xyz: Any  # scheduled (exp decay * spatial_lr_scale)
    f_dc: Any = 0.0025
    f_rest: Any = 0.0025 / 20.0
    opacity: Any = 0.05
    scaling: Any = 0.005
    rotation: Any = 0.001

    def as_params(self) -> GaussianParams:
        return GaussianParams(
            xyz=self.xyz,
            f_dc=self.f_dc,
            f_rest=self.f_rest,
            scaling=self.scaling,
            rotation=self.rotation,
            opacity=self.opacity,
        )


def expon_lr(step, lr_init, lr_final, max_steps, lr_delay_steps=0, lr_delay_mult=1.0):
    """Exponential log-lerp schedule (utils/general_utils.py:31-64)."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay = 1.0
    is_dead = (step < 0) | (lr_init == 0.0)
    return jnp.where(is_dead, 0.0, delay * log_lerp)


def adam_step(state: GaussianState, grads: GaussianParams, lrs: GroupLRs) -> GaussianState:
    """One Adam update on the active entries."""
    step = state.adam_step + 1
    bc1 = 1.0 - BETA1 ** step.astype(jnp.float32)
    bc2 = 1.0 - BETA2 ** step.astype(jnp.float32)
    act = state.active

    def upd(p, g, m, v, lr):
        mask = act.reshape((-1,) + (1,) * (p.ndim - 1))
        g = jnp.where(mask, g, 0.0)
        m_new = BETA1 * m + (1 - BETA1) * g
        v_new = BETA2 * v + (1 - BETA2) * g * g
        m_hat = m_new / bc1
        v_hat = v_new / bc2
        p_new = p - lr * m_hat / (jnp.sqrt(v_hat) + EPS)
        return jnp.where(mask, p_new, p), m_new, v_new

    lr_tree = lrs.as_params()
    out = jax.tree.map(upd, state.params, grads, state.adam_m, state.adam_v, lr_tree)
    new_p = jax.tree.map(lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple))
    new_m = jax.tree.map(lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple))
    new_v = jax.tree.map(lambda t: t[2], out, is_leaf=lambda x: isinstance(x, tuple))
    return state.replace(params=new_p, adam_m=new_m, adam_v=new_v, adam_step=step)
