"""Training checkpoint save/restore (SURVEY.md §5.4).

The reference torch.saves (gaussians.capture(), iteration) — all parameter
tensors, Adam state, densification accumulators, appearance net
(train.py:212-214, gaussian_model.py:71-109). Here the TrainState is already
one pytree (params + Adam moments + accumulators + appearance + iteration),
so a checkpoint is an orbax PyTree snapshot; filter_3D is captured too (the
reference recomputes it after restore — we keep both behaviors valid since
update_3d_filter is idempotent).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_checkpoint(path: str, train_state, iteration: int):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = {"state": jax.device_get(train_state), "iteration": int(iteration)}
    ocp.PyTreeCheckpointer().save(path, ckpt, force=True)


def load_checkpoint(path: str, template_state):
    """Restore into the structure of ``template_state`` (shapes must match,
    i.e. same capacity — grow/shrink before restoring if needed)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    template = {"state": jax.device_get(template_state), "iteration": 0}
    ckpt = ocp.PyTreeCheckpointer().restore(path, item=template)
    state = jax.tree.map(jax.numpy.asarray, ckpt["state"])
    return state, int(ckpt["iteration"])
