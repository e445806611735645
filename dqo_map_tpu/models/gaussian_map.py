"""Fixed-capacity Gaussian map state.

TPU-native redesign of `SLAM/gaussian_pointcloud.py`: the reference keeps
three torch clouds (temp/unstable/stable) and reallocates on every
add/delete/promote (`cat`/`delete`/`remove`,
gaussian_pointcloud.py:209-443). Under jit that would recompile every frame,
so here ALL gaussians live in ONE preallocated structure-of-arrays with a
per-slot `status` field (dead/unstable/stable):

- add      = scatter into free slots (invalid rows dropped via OOB scatter)
- delete   = status := DEAD (slots recycled by periodic host compaction)
- promote  = status := STABLE (no data movement — the reference's
             `gaussians_fix` copies whole tensors between clouds)
- renders over subsets (unstable-only, stable-only, global) are status
  filters passed to the rasterizer's valid mask.

Parameter semantics match the reference: scaling is log-space (exp
activation), opacity is pre-sigmoid, rotation is an unnormalized wxyz
quaternion, SH features are (K=16, 3) with DC at index 0.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.math3d import quat_to_rotmat, normalize
from ..utils.sh import rgb_to_sh

DEAD = 0
UNSTABLE = 1
STABLE = 2

SH_K = 16  # (max_sh_degree+1)^2 with degree 3


class MapState(NamedTuple):
    xyz: jnp.ndarray            # (N,3)
    sh: jnp.ndarray             # (N,16,3)
    scaling: jnp.ndarray        # (N,3) log-space
    rotation: jnp.ndarray       # (N,4) raw wxyz
    opacity: jnp.ndarray        # (N,) pre-sigmoid
    confidence: jnp.ndarray     # (N,)
    add_tick: jnp.ndarray       # (N,) int32 — frame the gaussian was added
    depth_err_cnt: jnp.ndarray  # (N,) int32
    color_err_cnt: jnp.ndarray  # (N,) int32
    frame_id: jnp.ndarray       # (N,) int32 — source frame (floater pruning)
    obj_id: jnp.ndarray         # (N,) int32 — object instance id (-1 = none)
    sem_rgb: jnp.ndarray        # (N,3) semantic color (ref `_semantics`,
                                #   gaussian_pointcloud.py; trained when
                                #   use_semantics via the semantic pass)
    status: jnp.ndarray         # (N,) int32 — DEAD/UNSTABLE/STABLE
    count: jnp.ndarray          # () int32 — high-water slot mark

    # --- derived quantities (activations) -----------------------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jnp.ndarray:
        return normalize(self.rotation)

    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    def get_radius(self) -> jnp.ndarray:
        """(sum - min)/2 of activated scales (ref gaussian_pointcloud.py:738-743)."""
        s = self.get_scaling()
        return (jnp.sum(s, axis=1) - jnp.min(s, axis=1)) / 2

    def get_normal(self) -> jnp.ndarray:
        """World normal = R column of the min-scale axis
        (ref gaussian_pointcloud.py:779-791)."""
        R = quat_to_rotmat(self.rotation)
        idx = jnp.argmin(self.scaling, axis=-1)
        n = jnp.take_along_axis(R, idx[:, None, None], axis=2)[..., 0]
        return normalize(n)

    def alive(self) -> jnp.ndarray:
        return self.status != DEAD

    def unstable_mask(self) -> jnp.ndarray:
        return self.status == UNSTABLE

    def stable_mask(self) -> jnp.ndarray:
        return self.status == STABLE

    def num_unstable(self) -> jnp.ndarray:
        return jnp.sum(self.status == UNSTABLE)

    def num_stable(self) -> jnp.ndarray:
        return jnp.sum(self.status == STABLE)


def empty_map(capacity: int) -> MapState:
    z = lambda *s: jnp.zeros(s, jnp.float32)
    zi = lambda *s: jnp.zeros(s, jnp.int32)
    return MapState(
        xyz=z(capacity, 3), sh=z(capacity, SH_K, 3), scaling=z(capacity, 3),
        rotation=jnp.zeros((capacity, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=z(capacity), confidence=z(capacity), add_tick=zi(capacity),
        depth_err_cnt=zi(capacity), color_err_cnt=zi(capacity),
        frame_id=zi(capacity), obj_id=jnp.full((capacity,), -1, jnp.int32),
        sem_rgb=z(capacity, 3),
        status=zi(capacity), count=jnp.int32(0),
    )


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def make_new_points(xyz: jnp.ndarray, normal: jnp.ndarray, color: jnp.ndarray,
                    valid: jnp.ndarray, time: jnp.ndarray,
                    frame_id: jnp.ndarray, init_opacity: float,
                    xyz_factor: tuple, obj_id: Optional[jnp.ndarray] = None,
                    sem_rgb: Optional[jnp.ndarray] = None):
    """Build raw parameter rows for freshly sampled pixels
    (ref `add_empty_points`, gaussian_pointcloud.py:445-517):
    SH DC from color, tiny log-scale placeholder (finalized by the KNN scale
    init), rotation aligning +z to the surface normal when the z-factor is
    anisotropic, opacity init_opacity."""
    M = xyz.shape[0]
    mag = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / (mag + 1e-8)
    valid = valid & (jnp.sum(normal, axis=-1) != 0)

    sh = jnp.zeros((M, SH_K, 3), jnp.float32).at[:, 0, :].set(rgb_to_sh(color))
    scaling = jnp.full((M, 3), np.log(1e-6), jnp.float32)
    if tuple(xyz_factor) == (1.0, 1.0, 1.0):
        rots = jnp.zeros((M, 4), jnp.float32).at[:, 0].set(1.0)
    else:
        from ..utils.math3d import quaternion_from_two_vectors
        z_axis = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (M, 3))
        rots = quaternion_from_two_vectors(z_axis, normal)
    import math
    opacity = jnp.full((M,), math.log(init_opacity / (1 - init_opacity)),
                       jnp.float32)
    return {
        "xyz": xyz, "sh": sh, "scaling": scaling, "rotation": rots,
        "opacity": opacity, "normal": normal, "valid": valid,
        "add_tick": jnp.full((M,), time, jnp.int32),
        "frame_id": jnp.full((M,), frame_id, jnp.int32),
        "obj_id": obj_id if obj_id is not None
        else jnp.full((M,), -1, jnp.int32),
        "sem_rgb": sem_rgb if sem_rgb is not None
        else jnp.zeros((M, 3), jnp.float32),
    }


def add_points(state: MapState, new: dict, status_value: int = UNSTABLE) -> MapState:
    """Scatter M new rows into free slots [count, count+n_valid).

    Invalid rows scatter out of bounds and are dropped, so slots are packed.
    """
    M = new["xyz"].shape[0]
    valid = new["valid"]
    pos = state.count + jnp.cumsum(valid.astype(jnp.int32)) - 1
    idx = jnp.where(valid, pos, state.capacity)  # OOB => dropped

    def sc(dst, src):
        return dst.at[idx].set(src, mode="drop")

    n_valid = jnp.sum(valid.astype(jnp.int32))
    return state._replace(
        xyz=sc(state.xyz, new["xyz"]),
        sh=sc(state.sh, new["sh"]),
        scaling=sc(state.scaling, new["scaling"]),
        rotation=sc(state.rotation, new["rotation"]),
        opacity=sc(state.opacity, new["opacity"]),
        confidence=sc(state.confidence, jnp.zeros((M,), jnp.float32)),
        add_tick=sc(state.add_tick, new["add_tick"]),
        depth_err_cnt=sc(state.depth_err_cnt, jnp.zeros((M,), jnp.int32)),
        color_err_cnt=sc(state.color_err_cnt, jnp.zeros((M,), jnp.int32)),
        frame_id=sc(state.frame_id, new["frame_id"]),
        obj_id=sc(state.obj_id, new["obj_id"]),
        sem_rgb=sc(state.sem_rgb, new["sem_rgb"]),
        status=sc(state.status,
                  jnp.full((M,), status_value, jnp.int32)),
        count=jnp.minimum(state.count + n_valid, state.capacity),
    )


def delete_points(state: MapState, mask: jnp.ndarray) -> MapState:
    return state._replace(status=jnp.where(mask, DEAD, state.status))


def promote_points(state: MapState, mask: jnp.ndarray,
                   confidence_cap: float) -> MapState:
    """unstable -> stable with confidence clipped
    (ref `gaussians_fix`, mapper.py:657-676)."""
    m = mask & (state.status == UNSTABLE)
    return state._replace(
        status=jnp.where(m, STABLE, state.status),
        confidence=jnp.where(m, jnp.minimum(state.confidence, confidence_cap),
                             state.confidence),
    )


def release_points(state: MapState, mask: jnp.ndarray,
                   time: jnp.ndarray) -> MapState:
    """stable -> unstable with confidence reset
    (ref `gaussians_release`, mapper.py:679-689)."""
    m = mask & (state.status == STABLE)
    return state._replace(
        status=jnp.where(m, UNSTABLE, state.status),
        confidence=jnp.where(m, 0.0, state.confidence),
        add_tick=jnp.where(m, time, state.add_tick),
    )


def compact(state: MapState) -> MapState:
    """Host-side repack of alive slots to the front (frees leaked slots).

    Called occasionally outside jit when `count` nears capacity.
    """
    alive = np.asarray(state.status) != DEAD
    order = np.concatenate([np.nonzero(alive)[0], np.nonzero(~alive)[0]])
    n_alive = int(alive.sum())

    def rearrange(x):
        x = np.asarray(x)
        return jnp.asarray(x[order])

    dead_state = np.zeros(state.capacity, np.int32)
    dead_state[:n_alive] = np.asarray(state.status)[order[:n_alive]]
    return MapState(
        xyz=rearrange(state.xyz), sh=rearrange(state.sh),
        scaling=rearrange(state.scaling), rotation=rearrange(state.rotation),
        opacity=rearrange(state.opacity), confidence=rearrange(state.confidence),
        add_tick=rearrange(state.add_tick),
        depth_err_cnt=rearrange(state.depth_err_cnt),
        color_err_cnt=rearrange(state.color_err_cnt),
        frame_id=rearrange(state.frame_id), obj_id=rearrange(state.obj_id),
        sem_rgb=rearrange(state.sem_rgb),
        status=jnp.asarray(dead_state), count=jnp.int32(n_alive),
    )


def grow(state: MapState, new_capacity: int) -> MapState:
    """Double capacity (host-side, rare)."""
    assert new_capacity > state.capacity
    pad = new_capacity - state.capacity

    def ext(x, fill=0):
        x = np.asarray(x)
        pads = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.asarray(np.pad(x, pads, constant_values=fill))

    return MapState(
        xyz=ext(state.xyz), sh=ext(state.sh), scaling=ext(state.scaling),
        rotation=ext(state.rotation), opacity=ext(state.opacity),
        confidence=ext(state.confidence), add_tick=ext(state.add_tick),
        depth_err_cnt=ext(state.depth_err_cnt),
        color_err_cnt=ext(state.color_err_cnt),
        frame_id=ext(state.frame_id), obj_id=ext(state.obj_id, -1),
        sem_rgb=ext(state.sem_rgb),
        status=ext(state.status), count=state.count,
    )
