"""Our Adam vs torch.optim.Adam (the reference's optimizer,
gaussian_model.py:349: Adam(lr per group, eps=1e-15))."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from radegs_tpu.models import gaussian_model as gm
from radegs_tpu.train.optim import GroupLRs, adam_step, expon_lr

RNG = np.random.default_rng(3)


def test_adam_matches_torch():
    P = 16
    st = gm.create_from_points(
        RNG.normal(size=(P, 3)).astype(np.float32),
        RNG.uniform(size=(P, 3)).astype(np.float32),
        capacity=P,
    )
    lrs = GroupLRs(xyz=0.001)

    t_params = {
        name: torch.tensor(np.asarray(getattr(st.params, name)), requires_grad=True)
        for name in ["xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity"]
    }
    lr_map = dict(xyz=0.001, f_dc=0.0025, f_rest=0.000125, opacity=0.05,
                  scaling=0.005, rotation=0.001)
    opt = torch.optim.Adam(
        [{"params": [t_params[n]], "lr": lr_map[n], "name": n} for n in t_params],
        lr=0.0, eps=1e-15,
    )

    for step in range(5):
        grads = {
            n: RNG.normal(size=t_params[n].shape).astype(np.float32)
            for n in t_params
        }
        for n in t_params:
            t_params[n].grad = torch.tensor(grads[n])
        opt.step()
        g_tree = gm.GaussianParams(**{n: jnp.asarray(grads[n]) for n in grads})
        st = adam_step(st, g_tree, lrs)

    for n in t_params:
        np.testing.assert_allclose(
            np.asarray(getattr(st.params, n)),
            t_params[n].detach().numpy(),
            rtol=2e-5,
            atol=1e-6,
            err_msg=n,
        )


def test_adam_skips_inactive():
    st = gm.create_from_points(
        RNG.normal(size=(4, 3)).astype(np.float32),
        RNG.uniform(size=(4, 3)).astype(np.float32),
        capacity=8,
    )
    before = np.asarray(st.params.xyz)
    g = jax.tree.map(jnp.ones_like, st.params)
    st2 = adam_step(st, g, GroupLRs(xyz=0.01))
    after = np.asarray(st2.params.xyz)
    assert not np.allclose(before[:4], after[:4])
    np.testing.assert_array_equal(before[4:], after[4:])


def test_expon_lr_matches_reference_formula():
    # utils/general_utils.py:31-64 oracle
    def oracle(step, lr_init, lr_final, max_steps, delay_steps=0, delay_mult=1.0):
        if step < 0 or (lr_init == 0.0):
            return 0.0
        if delay_steps > 0:
            delay_rate = delay_mult + (1 - delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = np.clip(step / max_steps, 0, 1)
        log_lerp = np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        return delay_rate * log_lerp

    for step in [0, 1, 100, 15000, 30000, 45000]:
        got = float(expon_lr(jnp.float32(step), 0.00016, 0.0000016, 30000))
        want = oracle(step, 0.00016, 0.0000016, 30000)
        np.testing.assert_allclose(got, want, rtol=1e-5)
