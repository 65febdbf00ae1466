from radegs_tpu.core.camera import Camera, fov2focal, focal2fov
from radegs_tpu.core.sh import eval_sh, rgb2sh, sh2rgb, num_sh_coeffs
from radegs_tpu.core.gaussians import (
    quat_to_rotmat,
    build_covariance,
    scaling_with_3d_filter,
    opacity_coef_3d_filter,
)
from radegs_tpu.core.projection import preprocess_gaussians, PreprocessOut
from radegs_tpu.core.eigen import sym3x3_eigendecomposition
