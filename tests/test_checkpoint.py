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


def test_checkpoint_restore_after_growth(tmp_path):
    """Resume must work when the checkpoint's capacity differs from the
    template's (the normal case after mid-run densification growth) —
    matching the reference's shape-agnostic restore()
    (scene/gaussian_model.py:89-109)."""
    rng = np.random.default_rng(0)
    g_small = gm.create_from_points(
        rng.normal(size=(40, 3)).astype(np.float32),
        rng.uniform(size=(40, 3)).astype(np.float32),
        capacity=64,
    )
    # grown mid-run: capacity 64 -> 256
    g_grown = gm.resize_capacity(g_small, 256)
    ts = init_train_state(g_grown, jax.random.PRNGKey(1))
    ts = ts.replace(iteration=jnp.asarray(777, jnp.int32))
    path = str(tmp_path / "chkpnt777")
    save_checkpoint(path, ts, 777)

    # template built from the INITIAL point cloud (capacity 64), as
    # scripts/train.py does for --start_checkpoint
    template = init_train_state(g_small, jax.random.PRNGKey(0))
    restored, it = load_checkpoint(path, template)
    assert it == 777
    assert restored.gaussians.capacity == 256
    np.testing.assert_array_equal(
        np.asarray(restored.gaussians.params.xyz), np.asarray(ts.gaussians.params.xyz)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.gaussians.active), np.asarray(ts.gaussians.active)
    )

    # restoring a SMALL checkpoint into a BIG template keeps the headroom
    ts_small = init_train_state(g_small, jax.random.PRNGKey(1))
    path2 = str(tmp_path / "chkpnt_small")
    save_checkpoint(path2, ts_small, 5)
    big_template = init_train_state(gm.resize_capacity(g_small, 512), jax.random.PRNGKey(0))
    restored2, _ = load_checkpoint(path2, big_template)
    assert restored2.gaussians.capacity == 512
    np.testing.assert_array_equal(
        np.asarray(restored2.gaussians.params.xyz)[:64],
        np.asarray(ts_small.gaussians.params.xyz),
    )
    assert not np.asarray(restored2.gaussians.active)[64:].any()


def test_resize_capacity_shrink_compacts():
    rng = np.random.default_rng(3)
    g = gm.create_from_points(
        rng.normal(size=(20, 3)).astype(np.float32),
        rng.uniform(size=(20, 3)).astype(np.float32),
        capacity=64,
    )
    # scatter the active set: deactivate some entries
    act = np.array(g.active)
    act[[3, 7, 11]] = False
    g = g.replace(active=jnp.asarray(act))
    small = gm.resize_capacity(g, 32)
    assert small.capacity == 32
    assert int(small.n_active()) == 17
    kept = np.asarray(g.params.xyz)[act]
    got = np.asarray(small.params.xyz)[np.asarray(small.active)]
    np.testing.assert_array_equal(np.sort(kept, axis=0), np.sort(got, axis=0))
