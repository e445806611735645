"""Multi-chip scaling via jax.sharding + shard_map.

The reference's only concurrency is 3 host processes over torch.mp queues
(`SLAM/multiprocess/system.py`) — nothing distributed. The TPU-native
scale-out story instead maps the OPTIMIZATION work over an ICI mesh:

- **keyframe data parallelism** (`dp_optimize_step`): the global-optimization
  batch of keyframes is sharded over the `dp` mesh axis; every device renders
  its keyframe shard against the (replicated) Gaussian map, gradients are
  `psum`ed over ICI, and the masked Adam update runs replicated. This is the
  multi-chip analogue of `Mapping.global_optimization` (mapper.py:1105-1228),
  which samples ONE keyframe per iteration on one GPU.
- **object parallelism** (`shard_objects_refine`): the vmapped dual-quadric
  refinement (`models/quadrics.refine_objects`) is sharded over objects.

Collectives ride ICI via standard XLA lowering; no NCCL/MPI analogue exists
or is needed.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gaussian_map import MapState
from ..ops.rasterize import RenderSettings
from ..slam.mapper import (AdamState, adam_init, adam_update, compute_loss,
                           get_params, set_params)
from ..slam.renderer import render_state


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    """Mesh over the first `n_devices` devices, clipped to what exists.

    Single real-TPU sessions get a 1-device mesh (the shard_map paths still
    compile and run); multi-device validation uses the virtual CPU platform
    (tests/conftest.py, `__graft_entry__._force_virtual_devices`)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        print(f"[parallel] requested {n} devices but only {len(devs)} "
              f"available; shrinking mesh")
        n = len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def _frame_loss(state: MapState, frames: dict, i, settings, weights,
                add_depth_thres, params, init_stat, opt_mask):
    cam = {
        "w2c": frames["w2c"][i], "full_proj": frames["full_proj"][i],
        "cam_pos": frames["cam_pos"][i], "K": frames["K"],
        "tan_fovx": frames["tan_fovx"], "tan_fovy": frames["tan_fovy"],
    }
    image_input = {
        "color_map": frames["color"][i], "depth_map": frames["depth"][i],
        "normal_map": frames["normal"][i],
        "render_mask": frames["render_mask"][i],
    }
    st = set_params(state, params)
    out = render_state(st, cam, settings, "global", None)
    loss, _ = compute_loss(out, image_input, params, init_stat, opt_mask,
                           weights, add_depth_thres, False)
    return loss


def dp_optimize_step(mesh: Mesh, state: MapState, frames: dict,
                     opt_state: AdamState, lrs: dict, weights: dict,
                     settings: RenderSettings, add_depth_thres: float,
                     status_value: int = 2):
    """One data-parallel Adam step over a sharded keyframe batch.

    `frames` arrays have leading dim F divisible by the mesh size; they are
    sharded over `dp` while the map state is replicated. Returns
    (new_state, new_opt_state, loss).
    """
    axis = mesh.axis_names[0]
    batched = {"color", "depth", "normal", "render_mask", "w2c", "full_proj",
               "cam_pos"}
    frame_specs = {k: (P(axis) if k in batched else P()) for k in frames}

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), frame_specs, P()),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    def step(state, frames_shard, opt_state):
        opt_mask = state.status == status_value
        params = get_params(state)
        init_stat = {
            "opacity": params["opacity"], "scaling": params["scaling"],
            "xyz": params["xyz"], "rotation": params["rotation"],
        }
        f_local = frames_shard["color"].shape[0]

        def mean_loss(p):
            losses = jax.lax.map(
                lambda i: _frame_loss(state, frames_shard, i, settings,
                                      weights, add_depth_thres, p, init_stat,
                                      opt_mask),
                jnp.arange(f_local),
            )
            return losses.mean()

        loss, grads = jax.value_and_grad(mean_loss)(params)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
        loss = jax.lax.pmean(loss, axis)
        params, opt_state = adam_update(params, grads, opt_state, lrs, opt_mask)
        return set_params(state, params), opt_state, loss

    return step(state, frames, opt_state)


def shard_objects_refine(mesh: Mesh, axes, R, center, obs_bbox, obs_P,
                         obs_valid, opt_mask, rand_idx, iters: int = 20):
    """Object-axis sharding of the batched dual-quadric refinement."""
    from ..models.quadrics import refine_objects
    axis = mesh.axis_names[0]
    sharded = NamedSharding(mesh, P(axis))
    args = [jax.device_put(x, sharded) for x in
            (axes, R, center, obs_bbox, obs_P, obs_valid, opt_mask)]
    rand = jax.device_put(rand_idx, NamedSharding(mesh, P(None, axis)))
    return refine_objects(*args, rand, iters=iters)
