"""Training checkpoint save/restore (SURVEY.md §5.4).

The reference torch.saves (gaussians.capture(), iteration) — all parameter
tensors, Adam state, densification accumulators, appearance net
(train.py:212-214, gaussian_model.py:71-109). Here the TrainState is already
one pytree (params + Adam moments + accumulators + appearance + iteration),
so a checkpoint is an orbax PyTree snapshot; filter_3D is captured too (the
reference recomputes it after restore — we keep both behaviors valid since
update_3d_filter is idempotent).

Restore is capacity-flexible, mirroring the reference's shape-agnostic
restore() (scene/gaussian_model.py:89-109): the checkpoint's own capacity is
read from its metadata first, the caller's template is resized to match, and
the result is grown back to at least the template's capacity — so resuming a
run whose capacity grew mid-densification (the normal case) just works.
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


def checkpoint_capacity(path: str) -> int:
    """The gaussian capacity stored in a checkpoint, read without loading the
    tensor data (falls back to a raw restore if metadata is unavailable)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    try:
        md = ocp.PyTreeCheckpointer().metadata(path)
        node = md["state"]["gaussians"]["params"]["xyz"]
        return int(node.shape[0])
    except Exception:
        raw = ocp.PyTreeCheckpointer().restore(path)
        return int(np.asarray(raw["state"]["gaussians"]["params"]["xyz"]).shape[0])


def load_checkpoint(path: str, template_state, capacity: int | None = None):
    """Restore into the structure of ``template_state``, resizing to the
    checkpoint's saved capacity automatically.

    The returned state's capacity is max(checkpoint, template, ``capacity``)
    so a resumed run never loses headroom it already had.
    """
    import orbax.checkpoint as ocp

    from radegs_tpu.models import gaussian_model as gm

    path = os.path.abspath(path)
    ckpt_cap = checkpoint_capacity(path)
    template_cap = template_state.gaussians.capacity
    if ckpt_cap != template_cap:
        # Only the template's STRUCTURE matters (its contents are overwritten
        # by the restore), so deactivate everything before a shrink — a
        # template built from a large init cloud must not fail the
        # resize_capacity n_active check (ADVICE r2).
        g = template_state.gaussians
        if ckpt_cap < template_cap:
            g = g.replace(active=jax.numpy.zeros_like(g.active))
        template_state = template_state.replace(
            gaussians=gm.resize_capacity(g, ckpt_cap)
        )
    template = {"state": jax.device_get(template_state), "iteration": 0}
    ckpt = ocp.PyTreeCheckpointer().restore(path, item=template)
    state = jax.tree.map(jax.numpy.asarray, ckpt["state"])
    target_cap = max(ckpt_cap, template_cap, capacity or 0)
    if target_cap != ckpt_cap:
        state = state.replace(gaussians=gm.resize_capacity(state.gaussians, target_cap))
    return state, int(ckpt["iteration"])
