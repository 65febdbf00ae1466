"""Orbax checkpoint round-trip: TrainState save -> restore -> resume."""

import jax
import jax.numpy as jnp
import numpy as np

from radegs_tpu.models import gaussian_model as gm
from radegs_tpu.train.loop import init_train_state
from radegs_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    g = gm.create_from_points(
        rng.normal(size=(40, 3)).astype(np.float32),
        rng.uniform(size=(40, 3)).astype(np.float32),
        capacity=64,
    )
    ts = init_train_state(g, jax.random.PRNGKey(1))
    ts = ts.replace(iteration=jnp.asarray(123, jnp.int32))

    path = str(tmp_path / "chkpnt123")
    save_checkpoint(path, ts, 123)

    template = init_train_state(g, jax.random.PRNGKey(0))
    restored, it = load_checkpoint(path, template)
    assert it == 123
    assert int(restored.iteration) == 123
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
