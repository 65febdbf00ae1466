"""Configuration dataclasses mirroring the reference's argument groups
(arguments/__init__.py:47-99) with identical defaults."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class ModelConfig:
    """ModelParams (arguments/__init__.py:47-67)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    kernel_size: float = 0.0  # 2D Mip filter
    use_coord_map: bool = False
    use_decoupled_appearance: bool = False
    disable_filter3D: bool = False
    eval: bool = False
    data_device: str = "tpu"


@dataclass(frozen=True)
class PipelineConfig:
    """PipelineParams (arguments/__init__.py:69-74)."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False
    # TPU-specific knobs
    max_per_tile: int = 512
    instance_multiplier: int = 8
    # explicit instance budget (0 = derive from capacity * multiplier);
    # the training loop's autotune pins this to the measured peak demand
    # rounded to a 2M-segment bucket (ops/binning.round_budget)
    instance_budget: int = 0
    # mesh path only: static per-shard cap on the visibility-compressed
    # gather (0 = lossless capacity/n). The loop's autotune shrinks it
    # toward the measured per-shard visible peak (n_vis_max) — the gather
    # bytes scale with this cap — and grows it back on n_vis_overflow.
    vis_capacity: int = 0
    backend: str = "auto"  # "xla" | "pallas" | "auto"


@dataclass(frozen=True)
class OptimizationConfig:
    """OptimizationParams (arguments/__init__.py:76-99)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    appearance_embeddings_lr: float = 0.001
    appearance_network_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    lambda_depth_normal: float = 0.05
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    regularization_from_iter: int = 15_000
    densify_grad_threshold: float = 0.0002


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
