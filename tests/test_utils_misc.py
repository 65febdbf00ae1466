"""vis colormaps, camera trajectories, cfg_args round-trip."""

import numpy as np

from radegs_tpu.core.camera import Camera
from radegs_tpu.utils.trajectories import ellipse_path
from radegs_tpu.utils.vis import apply_colormap, apply_depth_colormap, normal_to_rgb


def test_colormaps():
    x = np.linspace(0, 1, 64).reshape(8, 8)
    img = apply_colormap(x)
    assert img.shape == (8, 8, 3) and img.min() >= 0 and img.max() <= 1
    d = apply_depth_colormap(x * 5 + 1, accumulation=np.ones_like(x))
    assert d.shape == (8, 8, 3)
    n = normal_to_rgb(np.zeros((3, 4, 4), np.float32))
    assert np.allclose(n, 0.5)


def test_ellipse_path():
    cams = []
    for i in range(8):
        ang = 2 * np.pi * i / 8
        cams.append(Camera.look_at([3 * np.sin(ang), 0.5, -3 * np.cos(ang)],
                                   [0, 0, 0], [0, 1, 0], 0.9, 0.8, 64, 48))
    path = ellipse_path(cams, n_frames=24)
    assert len(path) == 24
    centers = np.stack([np.asarray(c.camera_center) for c in path])
    r = np.linalg.norm(centers[:, [0, 2]], axis=1)
    assert 2.0 < r.mean() < 4.0  # orbits at roughly the ring radius
    assert path[0].width == 64 and path[0].height == 48


def test_cfg_args_roundtrip(tmp_path):
    from radegs_tpu.train.arguments import load_cfg_args, save_cfg_args
    from radegs_tpu.train.config import ModelConfig

    m = ModelConfig(sh_degree=2, source_path="/data/x", kernel_size=0.1,
                    use_coord_map=True, eval=True)
    save_cfg_args(str(tmp_path), m)
    loaded = load_cfg_args(str(tmp_path))
    assert loaded["sh_degree"] == 2
    assert loaded["source_path"] == "/data/x"
    assert loaded["use_coord_map"] is True
    assert abs(loaded["kernel_size"] - 0.1) < 1e-12


def test_get_combined_args_merges_saved(tmp_path):
    import argparse

    from radegs_tpu.train.arguments import add_group, get_combined_args, save_cfg_args
    from radegs_tpu.train.config import ModelConfig

    save_cfg_args(str(tmp_path), ModelConfig(sh_degree=2, kernel_size=0.3,
                                             source_path="/saved/src"))
    p = argparse.ArgumentParser()
    add_group(p, ModelConfig, "ModelParams")
    # CLI sets model_path and overrides kernel_size; sh_degree comes from disk
    args = get_combined_args(p, ["-m", str(tmp_path), "--kernel_size", "0.7"])
    assert args.sh_degree == 2
    assert args.source_path == "/saved/src"
    assert abs(args.kernel_size - 0.7) < 1e-12
