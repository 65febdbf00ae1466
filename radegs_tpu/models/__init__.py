from radegs_tpu.models.gaussian_model import (
    GaussianParams,
    GaussianState,
    create_from_points,
    densify_and_prune,
    reset_opacity,
    update_3d_filter,
    add_densification_stats,
    save_gaussian_ply,
    load_gaussian_ply,
)
