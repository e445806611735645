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

from functools import lru_cache, partial
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


def dp_optimize_scan(mesh: Mesh, state: MapState, frames: dict,
                     fweight, lrs: dict, weights: dict,
                     settings: RenderSettings, iters: int, status_value: int,
                     add_depth_thres: float, subset: str = "stable",
                     bucket: Optional[int] = None,
                     with_tile_mask: bool = True,
                     use_ssim: bool = False):
    """Scan-compiled data-parallel replacement for `mapper.optimize_scan`.

    Compiled executables are cached per (mesh, settings, iters, ...) via
    `_dp_scan_factory`, so the steady-state keyframe cadence reuses one
    executable instead of retracing the shard_map closure every call.

    The keyframe batch (leading dim F, divisible by the mesh size — pad with
    weight-0 repeats) is sharded over the `dp` axis; the map state is
    replicated. Each iteration takes ONE Adam step on the exact
    fweight-weighted mean loss over ALL frames: every device evaluates its
    local shard's weighted loss sum, gradients ride a `psum` over ICI, and
    the masked Adam update runs replicated. Because the weighted mean is
    normalized on the host (sum(fweight)==1), an N-device mesh computes
    bit-near the same update as a 1-device mesh over the same frames
    (tests/test_parallel.py asserts this end-to-end through SLAMSystem).

    This is the multi-chip analogue of the reference's global optimization
    (mapper.py:1105-1228, one random keyframe per iteration on one GPU): the
    TPU version converts the random schedule into a full-batch weighted mean
    so the work parallelizes over ICI instead of serializing over iterations.

    Binning is hoisted per LOCAL frame outside the scan (cameras are fixed
    for the whole scan), exactly like the single-device path. Returns
    (state, reports) with the same report keys as optimize_scan.
    """
    F = frames["w2c"].shape[0]
    assert F % mesh.devices.size == 0, (F, mesh.devices.size)
    # lrs/weights are plain float dicts — fold them into the static cache key
    # (they change only between the local/global/final regimes)
    def _freeze(v):
        # lr entries may be arrays (the per-SH-coefficient lr vector)
        arr = np.asarray(v)
        return (arr.shape, tuple(arr.reshape(-1).tolist()))

    fn = _dp_scan_factory(
        mesh, settings, int(iters), int(status_value),
        float(add_depth_thres), subset, bucket, bool(with_tile_mask),
        bool(use_ssim),
        tuple(sorted(frames.keys())),
        tuple(sorted((k, _freeze(v)) for k, v in lrs.items())),
        tuple(sorted((k, float(v)) for k, v in weights.items())))
    return fn(state, frames, jnp.asarray(fweight, jnp.float32))


@lru_cache(maxsize=None)
def _dp_scan_factory(mesh: Mesh, settings: RenderSettings, iters: int,
                     status_value: int, add_depth_thres: float, subset: str,
                     bucket: Optional[int], with_tile_mask: bool,
                     use_ssim: bool,
                     frame_keys: tuple, lrs_items: tuple, weights_items: tuple):
    from ..slam.mapper import compute_loss
    from ..slam.renderer import compute_binning_state
    lrs = {k: jnp.asarray(vals, jnp.float32).reshape(shape) if shape
           else float(vals[0])
           for k, (shape, vals) in lrs_items}
    weights = dict(weights_items)
    axis = mesh.axis_names[0]
    batched = {"color", "depth", "normal", "render_mask", "tile_mask",
               "w2c", "full_proj", "cam_pos", "semantics_color",
               "instance_img"}
    frame_specs = {k: (P(axis) if k in batched else P()) for k in frame_keys}

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), frame_specs, P(axis)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def run(state, fr, w_shard):
        opt_mask = state.status == status_value
        params = get_params(state)
        init_stat = {
            "opacity": params["opacity"], "scaling": params["scaling"],
            "xyz": params["xyz"], "rotation": params["rotation"],
        }
        opt_state = adam_init(params)
        confidence0 = state.confidence
        f_local = fr["color"].shape[0]

        def cam_of(f):
            return {
                "w2c": fr["w2c"][f], "full_proj": fr["full_proj"][f],
                "cam_pos": fr["cam_pos"][f], "K": fr["K"],
                "tan_fovx": fr["tan_fovx"], "tan_fovy": fr["tan_fovy"],
            }

        per_frame = []
        for f in range(f_local):
            tm_f = fr["tile_mask"][f] if with_tile_mask else None
            per_frame.append(compute_binning_state(
                state, cam_of(f), settings, subset, tm_f, bucket=bucket))
        binnings = jax.tree.map(lambda *xs: jnp.stack(xs), *per_frame)

        def weighted_loss(p):
            def floss(i):
                cam = cam_of(i)
                tm = fr["tile_mask"][i] if with_tile_mask else None
                binning = jax.tree.map(lambda x: x[i], binnings)
                st = set_params(state, p)
                out = render_state(st, cam, settings, subset, tm,
                                   bucket=bucket, binning=binning)
                image_input = {
                    "color_map": fr["color"][i], "depth_map": fr["depth"][i],
                    "normal_map": fr["normal"][i],
                    "render_mask": fr["render_mask"][i],
                }
                sem = None
                if "semantics_color" in fr:
                    image_input["semantics_color"] = fr["semantics_color"][i]
                    sem = render_state(st, cam, settings, subset, tm,
                                       colors_precomp=p["sem_rgb"],
                                       bucket=bucket, binning=binning)["render"]
                if "instance_img" in fr:
                    image_input["instance_img"] = fr["instance_img"][i]
                loss, _ = compute_loss(out, image_input, p, init_stat,
                                       opt_mask, weights, add_depth_thres,
                                       use_ssim, sem_render=sem)
                return loss
            losses = jax.lax.map(floss, jnp.arange(f_local))
            return (losses * w_shard).sum()

        def step(carry, _):
            params, opt_state, confidence = carry
            loss, grads = jax.value_and_grad(weighted_loss)(params)
            grads = jax.tree.map(lambda g: jax.lax.psum(g, axis), grads)
            loss = jax.lax.psum(loss, axis)
            params, opt_state = adam_update(params, grads, opt_state, lrs,
                                            opt_mask)
            grad_mask = jnp.any(jnp.abs(grads["sh"][:, 0, :]) != 0, axis=-1)
            confidence = confidence + (grad_mask & opt_mask).astype(
                jnp.float32)
            return (params, opt_state, confidence), loss

        (params, _, confidence), losses = jax.lax.scan(
            step, (params, opt_state, confidence0), None, length=iters)
        new_state = set_params(state, params)._replace(confidence=confidence)
        reports = {
            "loss": losses,
            "dropped_entries": jnp.broadcast_to(
                jax.lax.pmax(jnp.max(binnings.dropped), axis), (iters,)),
            "clipped_cells": jnp.broadcast_to(
                jax.lax.pmax(jnp.max(binnings.clipped), axis), (iters,)),
            "num_entries": jnp.broadcast_to(
                jax.lax.pmax(jnp.max(binnings.num_entries), axis), (iters,)),
        }
        return new_state, reports

    return jax.jit(run)


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
