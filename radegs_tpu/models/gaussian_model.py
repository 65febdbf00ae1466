"""Gaussian parameter store with capacity-padded, jit-compatible
densification (the reference's GaussianModel, scene/gaussian_model.py:27-747,
re-designed for static XLA shapes).

Design notes (vs. the reference):

- Arrays are allocated at a fixed *capacity* C with an ``active`` mask.
  Growth/shrink from densify/prune becomes masked compaction inside jit; the
  host only reallocates (and triggers one recompile) when occupancy crosses
  capacity, growing in powers of two.
- The optimizer is a hand-rolled Adam (train.optim) whose moments live next
  to the parameters, so the reference's "optimizer state surgery"
  (gaussian_model.py:561-637) becomes the same gather/scatter applied to
  (m, v): zeros for new entries, permuted for kept ones.
- Densification is the GOF strategy (gaussian_model.py:662-741): clone
  (sampled position) below the size threshold, split (N=2, scale/1.6) above,
  gated by mean screen-gradient >= tau OR abs-gradient >= quantile Q;
  prune on opacity < min and world-size > 0.1*extent.
  NOTE a reference quirk reproduced deliberately: densification_postfix
  zeroes max_radii2D for *all* points (gaussian_model.py:659), so the
  "big_points_vs" screen-size prune (gaussian_model.py:735) can never fire
  in the same call; it is therefore omitted here too.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from radegs_tpu.core.gaussians import (
    compute_3d_filter,
    fuse_3d_filter,
    quat_to_rotmat,
)
from radegs_tpu.core.sh import num_sh_coeffs, rgb2sh
from radegs_tpu.ops.knn import mean_dist2_knn
from radegs_tpu.utils import ply as plyio


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@struct.dataclass
class GaussianParams:
    """The six optimizable tensors (scene/gaussian_model.py:47-69)."""

    xyz: Any  # (C,3)
    f_dc: Any  # (C,1,3)
    f_rest: Any  # (C,M-1,3)
    scaling: Any  # (C,3)  log-scales
    rotation: Any  # (C,4)  unnormalized quaternion
    opacity: Any  # (C,1)  logit


@struct.dataclass
class GaussianState:
    params: GaussianParams
    active: Any  # (C,) bool
    filter_3d: Any  # (C,1)  Mip 3D filter width
    max_radii2d: Any  # (C,)
    grad_accum: Any  # (C,)  sum of ||dL/d ndc-mean2D||
    grad_abs_accum: Any  # (C,)  sum of GOF abs screen-grad
    grad_abs_max: Any  # (C,)
    denom: Any  # (C,)
    adam_m: GaussianParams
    adam_v: GaussianParams
    adam_step: Any  # () int32
    active_sh_degree: Any  # () int32
    max_sh_degree: int = struct.field(pytree_node=False, default=3)

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    def n_active(self):
        return jnp.sum(self.active.astype(jnp.int32))

    # ---- activations (scene/gaussian_model.py:29-45) ----
    def get_scaling(self):
        return jnp.exp(self.params.scaling)

    def get_rotation(self):
        q = self.params.rotation
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    def get_opacity(self):
        return jax.nn.sigmoid(self.params.opacity)

    def get_features(self):
        return jnp.concatenate([self.params.f_dc, self.params.f_rest], axis=1)

    def get_fused_scaling_opacity(self):
        """Mip-fused (scales, opacity) (gaussian_model.py:157-166)."""
        return fuse_3d_filter(self.get_scaling(), self.get_opacity(), self.filter_3d)


def _zeros_like_params(p: GaussianParams) -> GaussianParams:
    return jax.tree.map(jnp.zeros_like, p)


def empty_state(capacity: int, sh_degree: int = 3) -> GaussianState:
    M = num_sh_coeffs(sh_degree)
    f32 = jnp.float32
    params = GaussianParams(
        xyz=jnp.zeros((capacity, 3), f32),
        f_dc=jnp.zeros((capacity, 1, 3), f32),
        f_rest=jnp.zeros((capacity, M - 1, 3), f32),
        scaling=jnp.full((capacity, 3), -10.0, f32),
        rotation=jnp.tile(jnp.array([1, 0, 0, 0], f32), (capacity, 1)),
        opacity=jnp.full((capacity, 1), -10.0, f32),
    )
    zc = lambda: jnp.zeros((capacity,), f32)
    return GaussianState(
        params=params,
        active=jnp.zeros((capacity,), bool),
        filter_3d=jnp.zeros((capacity, 1), f32),
        max_radii2d=zc(),
        grad_accum=zc(),
        grad_abs_accum=zc(),
        grad_abs_max=zc(),
        denom=zc(),
        adam_m=_zeros_like_params(params),
        adam_v=_zeros_like_params(params),
        adam_step=jnp.zeros((), jnp.int32),
        active_sh_degree=jnp.zeros((), jnp.int32),
        max_sh_degree=sh_degree,
    )


def round_capacity(n: int, minimum: int = 1 << 12) -> int:
    return max(minimum, 1 << int(np.ceil(np.log2(max(n, 1)))))


def create_from_points(
    points, colors, sh_degree: int = 3, capacity: int | None = None
) -> GaussianState:
    """Initialize from a point cloud (scene/gaussian_model.py:301-328):
    scales from sqrt(mean 3-NN dist^2), opacity 0.1, identity rotation,
    DC color from RGB."""
    points = jnp.asarray(points, jnp.float32)
    colors = jnp.asarray(colors, jnp.float32)
    P = points.shape[0]
    if capacity is None:
        capacity = round_capacity(P)
    state = empty_state(capacity, sh_degree)

    dist2 = jnp.maximum(mean_dist2_knn(points), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    opac = inverse_sigmoid(0.1 * jnp.ones((P, 1), jnp.float32))
    f_dc = rgb2sh(colors)[:, None, :]

    def put(dst, src):
        return dst.at[:P].set(src.astype(dst.dtype))

    params = GaussianParams(
        xyz=put(state.params.xyz, points),
        f_dc=put(state.params.f_dc, f_dc),
        f_rest=state.params.f_rest,
        scaling=put(state.params.scaling, scales),
        rotation=state.params.rotation,
        opacity=put(state.params.opacity, opac),
    )
    return state.replace(params=params, active=state.active.at[:P].set(True))


def update_3d_filter(state: GaussianState, cameras) -> GaussianState:
    """Recompute the Mip 3D filter from the camera set
    (scene/gaussian_model.py:180-232)."""
    f = compute_3d_filter(state.params.xyz, cameras)
    return state.replace(filter_3d=jnp.where(state.active[:, None], f, 0.0))


def reset_3d_filter(state: GaussianState) -> GaussianState:
    return state.replace(filter_3d=jnp.zeros_like(state.filter_3d))


def update_3d_filter_partial(state: GaussianState, cameras, new_mask) -> GaussianState:
    """Incremental Mip-filter refresh for newly added points only
    (scene/gaussian_model.py:235-293, compute_partial_3D_filter — dead code
    in the reference, ported for inventory completeness).

    The reference appends filter values for points past the stored filter
    length; in the capacity-padded static-shape model the equivalent is a
    MASKED update: positions under ``new_mask`` get the freshly computed
    filter, everything else keeps its stored value. (On TPU the full
    static-shape compute costs the same either way; the semantics — old
    points keep their possibly-stale filter — are what the method is for.)
    """
    f = compute_3d_filter(state.params.xyz, cameras)
    upd = jnp.where(new_mask[:, None], f, state.filter_3d)
    return state.replace(filter_3d=jnp.where(state.active[:, None], upd, 0.0))


def oneup_sh_degree(state: GaussianState) -> GaussianState:
    return state.replace(
        active_sh_degree=jnp.minimum(state.active_sh_degree + 1, state.max_sh_degree)
    )


def add_densification_stats(state: GaussianState, xy_grad, xy_abs_grad, visible) -> GaussianState:
    """Accumulate screen-gradient statistics (gaussian_model.py:743-747).

    xy_grad: (C,2) dL/d pixel-space center; converted to NDC scale here.
    xy_abs_grad: (C,) the GOF |grad| side channel (already NDC-scaled).
    visible: (C,) bool radii>0 mask.
    """
    gnorm = jnp.linalg.norm(xy_grad, axis=-1)
    vis = visible & state.active
    return state.replace(
        grad_accum=state.grad_accum + jnp.where(vis, gnorm, 0.0),
        grad_abs_accum=state.grad_abs_accum + jnp.where(vis, xy_abs_grad, 0.0),
        grad_abs_max=jnp.maximum(state.grad_abs_max, jnp.where(vis, xy_abs_grad, 0.0)),
        denom=state.denom + vis.astype(jnp.float32),
    )


def update_max_radii(state: GaussianState, radii, visible) -> GaussianState:
    vis = visible & state.active
    return state.replace(
        max_radii2d=jnp.where(vis, jnp.maximum(state.max_radii2d, radii), state.max_radii2d)
    )


def _masked_quantile(values, mask, q):
    """Quantile over masked entries (torch.quantile with linear interp)."""
    big = jnp.finfo(values.dtype).max
    v = jnp.sort(jnp.where(mask, values, big))
    n = jnp.sum(mask.astype(jnp.int32))
    pos = q * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, values.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, values.shape[0] - 1)
    frac = pos - lo.astype(jnp.float32)
    lo_v, hi_v = v[lo], v[jnp.minimum(hi, jnp.maximum(n - 1, 0))]
    return lo_v * (1 - frac) + hi_v * frac


def densify_and_prune(
    state: GaussianState,
    key,
    max_grad: float,
    min_opacity: float,
    extent,
    percent_dense: float = 0.01,
    prune_big_ws: bool | Any = True,
) -> Tuple[GaussianState, dict]:
    """GOF densify + prune (gaussian_model.py:717-741) under static shapes.

    Candidate layout: [originals | clone copies | split copy A | split copy B],
    masked-compacted back into the same capacity. Returns (state, stats) with
    stats = {n_clone, n_split, n_prune, n_drop (capacity overflow), n_active}.
    """
    p = state.params
    C = state.capacity
    active = state.active

    denom = jnp.maximum(state.denom, 1.0)
    grads = jnp.where(state.denom > 0, state.grad_accum / denom, 0.0)
    grads_abs = jnp.where(state.denom > 0, state.grad_abs_accum / denom, 0.0)

    ratio = jnp.sum(jnp.where(active, (grads >= max_grad).astype(jnp.float32), 0.0)) / jnp.maximum(
        jnp.sum(active.astype(jnp.float32)), 1.0
    )
    Q = _masked_quantile(grads_abs, active, 1.0 - ratio)

    scales = jnp.exp(p.scaling)
    max_scale = jnp.max(scales, axis=-1)
    hot = active & ((grads >= max_grad) | (grads_abs >= Q))
    clone = hot & (max_scale <= percent_dense * extent)
    split = hot & (max_scale > percent_dense * extent)

    opac = jax.nn.sigmoid(p.opacity[:, 0])
    prune_op = opac < min_opacity
    ws_big = jnp.asarray(prune_big_ws) & (max_scale > 0.1 * extent)

    R = quat_to_rotmat(p.rotation)
    k1, k2, k3 = jax.random.split(key, 3)

    def sampled_xyz(k):
        eps = jax.random.normal(k, (C, 3)) * scales
        return p.xyz + jnp.einsum("cij,cj->ci", R, eps)

    # block 0: kept originals (split originals are consumed; pruned dropped)
    keep0 = active & ~split & ~(prune_op | ws_big)
    # block 1: clone copies at a sampled position (gaussian_model.py:698-704)
    clone_params = p.replace(xyz=sampled_xyz(k1))
    keep1 = clone & ~(prune_op | ws_big)
    # blocks 2,3: split copies, scale/(0.8*N) with N=2 (gaussian_model.py:675-684)
    new_scaling = jnp.log(scales / 1.6)
    split_a = p.replace(xyz=sampled_xyz(k2), scaling=new_scaling)
    split_b = p.replace(xyz=sampled_xyz(k3), scaling=new_scaling)
    ws_big_split = jnp.asarray(prune_big_ws) & (jnp.max(scales / 1.6, -1) > 0.1 * extent)
    keep23 = split & ~(prune_op | ws_big_split)

    blocks = [p, clone_params, split_a, split_b]
    keeps = [keep0, keep1, keep23, keep23]
    # adam moments: kept originals carry theirs; new entries start at zero
    zeros_p = _zeros_like_params(p)
    m_blocks = [state.adam_m, zeros_p, zeros_p, zeros_p]
    v_blocks = [state.adam_v, zeros_p, zeros_p, zeros_p]
    filt_blocks = [state.filter_3d] * 4  # refreshed right after by update_3d_filter

    keep_all = jnp.concatenate(keeps)  # (4C,)
    # stable order: kept entries first, preserving block order
    order = jnp.argsort(~keep_all, stable=True)[:C]
    n_new = jnp.sum(keep_all.astype(jnp.int32))
    n_drop = jnp.maximum(n_new - C, 0)

    def compact(blocks_list):
        cat = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *blocks_list)
        return jax.tree.map(lambda x: x[order], cat)

    new_params = compact(blocks)
    new_m = compact(m_blocks)
    new_v = compact(v_blocks)
    new_filter = jnp.concatenate(filt_blocks)[order]
    new_active = jnp.arange(C) < jnp.minimum(n_new, C)

    zc = jnp.zeros((C,), jnp.float32)
    stats = {
        "n_clone": jnp.sum(keep1.astype(jnp.int32)),
        "n_split": jnp.sum(split.astype(jnp.int32)),
        "n_prune": jnp.sum((active & (prune_op | ws_big)).astype(jnp.int32)),
        "n_drop": n_drop,
        "n_active": jnp.minimum(n_new, C),
    }
    new_state = state.replace(
        params=new_params,
        active=new_active,
        filter_3d=jnp.where(new_active[:, None], new_filter, 0.0),
        max_radii2d=zc,  # reference postfix quirk (gaussian_model.py:659)
        grad_accum=zc,
        grad_abs_accum=zc,
        grad_abs_max=zc,
        denom=zc,
        adam_m=new_m,
        adam_v=new_v,
    )
    return new_state, stats


def reset_opacity(state: GaussianState) -> GaussianState:
    """Clamp opacity to <= 0.01 accounting for the 3D filter
    (gaussian_model.py:495-513), and zero the opacity Adam moments
    (replace_tensor_to_optimizer, gaussian_model.py:561-576)."""
    scales = state.get_scaling()
    s2 = jnp.square(scales)
    coef = jnp.sqrt(
        jnp.prod(s2, -1) / jnp.prod(s2 + jnp.square(state.filter_3d), -1)
    )[:, None]
    filtered = state.get_opacity() * coef
    new = jnp.minimum(filtered, 0.01) / jnp.maximum(coef, 1e-10)
    new_logit = inverse_sigmoid(jnp.clip(new, 1e-7, 1 - 1e-7))
    params = state.params.replace(opacity=new_logit)
    return state.replace(
        params=params,
        adam_m=state.adam_m.replace(opacity=jnp.zeros_like(new_logit)),
        adam_v=state.adam_v.replace(opacity=jnp.zeros_like(new_logit)),
    )


def maybe_grow(state: GaussianState, headroom: float = 0.9) -> GaussianState:
    """Host-side capacity doubling when occupancy crosses ``headroom``.
    Triggers one recompile per growth (powers of two)."""
    n = int(state.n_active())
    C = state.capacity
    if n < headroom * C:
        return state
    newC = C * 2

    def grow(x):
        pad = [(0, newC - C)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)

    grow_p = lambda pp: jax.tree.map(grow, pp)
    return state.replace(
        params=grow_p(state.params),
        active=grow(state.active),
        filter_3d=grow(state.filter_3d),
        max_radii2d=grow(state.max_radii2d),
        grad_accum=grow(state.grad_accum),
        grad_abs_accum=grow(state.grad_abs_accum),
        grad_abs_max=grow(state.grad_abs_max),
        denom=grow(state.denom),
        adam_m=grow_p(state.adam_m),
        adam_v=grow_p(state.adam_v),
    )


def resize_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Return a state with capacity ``new_capacity`` (host-side, recompile
    trigger). Growing pads with inactive slots; shrinking compacts active
    entries first and requires n_active <= new_capacity — the shape-agnostic
    analogue of the reference's restore() (scene/gaussian_model.py:89-109),
    which accepts any point count because torch tensors carry their shapes."""
    C = state.capacity
    if new_capacity == C:
        return state
    if new_capacity > C:
        pad_n = new_capacity - C

        def grow(x):
            pad = [(0, pad_n)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad)

        grow_p = lambda pp: jax.tree.map(grow, pp)
        return state.replace(
            params=grow_p(state.params),
            active=grow(state.active),
            filter_3d=grow(state.filter_3d),
            max_radii2d=grow(state.max_radii2d),
            grad_accum=grow(state.grad_accum),
            grad_abs_accum=grow(state.grad_abs_accum),
            grad_abs_max=grow(state.grad_abs_max),
            denom=grow(state.denom),
            adam_m=grow_p(state.adam_m),
            adam_v=grow_p(state.adam_v),
        )
    n = int(state.n_active())
    if n > new_capacity:
        raise ValueError(
            f"cannot shrink capacity to {new_capacity}: {n} active gaussians"
        )
    # compact active entries to the front, then truncate
    order = np.argsort(~np.asarray(jax.device_get(state.active)), kind="stable")
    idx = jnp.asarray(order[:new_capacity])
    take = lambda x: x[idx]
    take_p = lambda pp: jax.tree.map(take, pp)
    return state.replace(
        params=take_p(state.params),
        active=take(state.active),
        filter_3d=take(state.filter_3d),
        max_radii2d=take(state.max_radii2d),
        grad_accum=take(state.grad_accum),
        grad_abs_accum=take(state.grad_abs_accum),
        grad_abs_max=take(state.grad_abs_max),
        denom=take(state.denom),
        adam_m=take_p(state.adam_m),
        adam_v=take_p(state.adam_v),
    )


def get_tetra_points(state: GaussianState):
    """Tetrahedralization seeds (gaussian_model.py:399-429): the 8 oriented
    box corners at 3-sigma (filtered scales) plus the centers.

    Returns (points (9n,3), point_scales (9n,)) over active Gaussians,
    corners first then centers — matching the reference's ordering.
    """
    act = np.asarray(jax.device_get(state.active))
    sel = np.nonzero(act)[0]
    xyz = np.asarray(jax.device_get(state.params.xyz))[sel]
    rot = np.asarray(jax.device_get(state.get_rotation()))[sel]
    scales, _ = state.get_fused_scaling_opacity()
    scale = np.asarray(jax.device_get(scales))[sel] * 3.0

    R = np.asarray(jax.device_get(quat_to_rotmat(jnp.asarray(rot))))
    # unit box corners (+-1), trimesh.creation.box() * 2 ordering-equivalent
    corners = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], np.float64
    )  # (8,3)
    pts = xyz[:, None, :] + np.einsum("nij,nkj->nki", R, corners[None] * scale[:, None, :])
    pts = pts.reshape(-1, 3)
    all_pts = np.concatenate([pts, xyz], axis=0)
    smax = scale.max(axis=-1)
    all_scales = np.concatenate([np.repeat(smax, 8), smax], axis=0)
    return all_pts.astype(np.float32), all_scales.astype(np.float32)


def get_truc_tetra_points(state: GaussianState, cameras, depth_truc: float):
    """Depth-truncated tetra seeds (gaussian_model.py:431-493,
    get_truc_tetra_points — dead code in the reference, ported for inventory
    completeness): get_tetra_points restricted to Gaussians whose center
    projects in front of some camera at z in (0.2, depth_truc) inside the
    15%-padded image rectangle.

    Divergence (documented): the reference slices by ``valid_depth`` — the
    mask of only the LAST camera in the loop — while accumulating
    ``valid_points`` it never uses; the accumulated any-camera mask is the
    evident intent and is what this uses.
    """
    import numpy as _np

    xyz = _np.asarray(jax.device_get(state.params.xyz))
    valid = _np.zeros((xyz.shape[0],), bool)
    for cam in cameras:
        W, H = cam.width, cam.height
        focal_x = W / (2.0 * _np.tan(cam.fovx / 2.0))
        focal_y = H / (2.0 * _np.tan(cam.fovy / 2.0))
        Rw2c = _np.asarray(cam.R, _np.float32).T
        xyz_cam = xyz @ Rw2c.T + _np.asarray(cam.T, _np.float32)[None, :]
        z = xyz_cam[:, 2]
        zc = _np.maximum(z, 0.001)
        x = xyz_cam[:, 0] / zc * focal_x + W / 2.0
        y = xyz_cam[:, 1] / zc * focal_y + H / 2.0
        in_screen = ((x >= -0.15 * W) & (x <= 1.15 * W)
                     & (y >= -0.15 * H) & (y <= 1.15 * H))
        valid |= (z > 0.2) & (z < depth_truc) & in_screen
    sub = state.replace(active=state.active & jnp.asarray(valid))
    return get_tetra_points(sub)


# ------------------------------------------------------------- PLY I/O ----


def save_gaussian_ply(path, state: GaussianState):
    """Reference-compatible PLY snapshot (gaussian_model.py:363-397),
    including the filter_3D attribute."""
    act = np.asarray(state.active)
    p = jax.device_get(state.params)
    n = int(act.sum())
    sel = np.nonzero(act)[0]
    xyz = np.asarray(p.xyz)[sel]
    f_dc = np.asarray(p.f_dc)[sel].transpose(0, 2, 1).reshape(n, -1)  # (n, 3)
    f_rest = np.asarray(p.f_rest)[sel].transpose(0, 2, 1).reshape(n, -1)
    opac = np.asarray(p.opacity)[sel]
    scale = np.asarray(p.scaling)[sel]
    rot = np.asarray(p.rotation)[sel]
    filt = np.asarray(state.filter_3d)[sel]

    names = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(f_dc.shape[1])]
        + [f"f_rest_{i}" for i in range(f_rest.shape[1])]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
        + ["filter_3D"]
    )
    cols = np.concatenate(
        [xyz, np.zeros_like(xyz), f_dc, f_rest, opac, scale, rot, filt], axis=1
    ).astype(np.float32)
    arr = np.rec.fromarrays(cols.T, dtype=[(nm, "f4") for nm in names])
    plyio.write_ply(path, {"vertex": np.asarray(arr)})


def load_gaussian_ply(path, sh_degree: int = 3, capacity: int | None = None) -> GaussianState:
    """Load a reference-format PLY (gaussian_model.py:515-559)."""
    v = plyio.read_ply(path)["vertex"]
    n = len(v)
    names = v.dtype.names
    M = num_sh_coeffs(sh_degree)
    xyz = np.stack([v["x"], v["y"], v["z"]], 1)
    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], 1).reshape(n, 3, 1)
    rest_names = sorted(
        (nm for nm in names if nm.startswith("f_rest_")), key=lambda s: int(s.split("_")[-1])
    )
    assert len(rest_names) == 3 * (M - 1), f"SH count mismatch: {len(rest_names)}"
    f_rest = np.stack([v[nm] for nm in rest_names], 1).reshape(n, 3, M - 1)
    opac = np.asarray(v["opacity"])[:, None]
    scale = np.stack([v[f"scale_{i}"] for i in range(3)], 1)
    rot = np.stack([v[f"rot_{i}"] for i in range(4)], 1)
    filt = (
        np.asarray(v["filter_3D"])[:, None] if "filter_3D" in names else np.zeros((n, 1))
    )

    if capacity is None:
        capacity = round_capacity(n)
    state = empty_state(capacity, sh_degree)
    put = lambda dst, src: dst.at[:n].set(jnp.asarray(src, jnp.float32))
    params = GaussianParams(
        xyz=put(state.params.xyz, xyz),
        f_dc=put(state.params.f_dc, f_dc.transpose(0, 2, 1)),
        f_rest=put(state.params.f_rest, f_rest.transpose(0, 2, 1)),
        scaling=put(state.params.scaling, scale),
        rotation=put(state.params.rotation, rot),
        opacity=put(state.params.opacity, opac),
    )
    return state.replace(
        params=params,
        active=state.active.at[:n].set(True),
        filter_3d=put(state.filter_3d, filt),
        active_sh_degree=jnp.asarray(sh_degree, jnp.int32),
    )
