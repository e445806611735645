"""Full SLAM checkpoint / resume.

The reference only snapshots the map as PLY files plus the trajectory
(`save_model_ply` gaussian_pointcloud.py:641+, `prepare_cfg` SLAM/utils.py:
254+); a crashed run cannot be resumed mid-sequence. Here a checkpoint is a
single ``.npz`` (map arrays, exact int state) plus a pickle sidecar for the
host-side bookkeeping (keyframes, object layer, tracker pose lists), and
``SLAMSystem`` can restart from any frame.

Map arrays dominate the size and compress well; everything device-side is
pulled to host numpy so a checkpoint never holds TPU buffers alive.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

CKPT_VERSION = 1


def _to_np(tree):
    import jax
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, system) -> str:
    """Write <path>.npz + <path>.pkl; returns the npz path."""
    import jax.numpy as jnp
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    m = system.mapping
    t = system.tracker
    state = m.state
    arrays = {f"map_{k}": np.asarray(getattr(state, k))
              for k in state._fields}
    arrays["key"] = np.asarray(jnp.ravel(
        jnp.asarray(__import__("jax").random.key_data(m.key))))
    np.savez_compressed(path + ".npz", version=CKPT_VERSION, **arrays)

    host = {
        "version": CKPT_VERSION,
        "mapper": {
            "time": m.time, "iter": m.iter, "bucket": m.bucket,
            "keyframe_ids": list(m.keyframe_ids),
            "optimize_frames_ids": list(m.optimize_frames_ids),
            "keyframes": [(kf[0].uid, _to_np(kf[1]), _to_np(kf[2]))
                          for kf in m.keyframes],
            "processed_frames": [(_to_np(c), _to_np(fm))
                                 for c, fm in m.processed_frames],
            "last_reports": dict(m.last_reports),
        },
        "tracker": {
            "pose_es": [np.asarray(p) for p in t.pose_es],
            "pose_gt": [np.asarray(p) for p in t.pose_gt],
            "timestamps": list(t.timestamps),
            "icp_fail_count": t.icp_fail_count,
        },
        "recorder": (dict(system.recorder.means),
                     dict(system.recorder.counts)),
        "metrics_history": list(system.metrics_history),
        "objects": system.object_layer,
    }
    with open(path + ".pkl", "wb") as f:
        pickle.dump(host, f)
    return path + ".npz"


def load_checkpoint(path: str, system) -> int:
    """Restore `system` in place; returns the next frame id to process."""
    import jax
    import jax.numpy as jnp

    from ..models.gaussian_map import MapState

    z = np.load(path + ".npz")
    assert int(z["version"]) == CKPT_VERSION, "checkpoint version mismatch"
    m = system.mapping
    cap = int(z["map_xyz"].shape[0])
    import numpy as _np
    def _get(k):
        if f"map_{k}" in z:
            return z[f"map_{k}"]
        if k == "sem_rgb":                       # pre-sem_rgb checkpoints
            return _np.zeros((cap, 3), _np.float32)
        raise KeyError(k)
    m.state = MapState(**{k: jnp.asarray(_get(k))
                          for k in MapState._fields})
    m.key = jax.random.wrap_key_data(jnp.asarray(z["key"], jnp.uint32))

    with open(path + ".pkl", "rb") as f:
        host = pickle.load(f)
    mp = host["mapper"]
    m.time = mp["time"]
    m.iter = mp["iter"]
    m.bucket = mp["bucket"]
    m.keyframe_ids = list(mp["keyframe_ids"])
    m.optimize_frames_ids = list(mp["optimize_frames_ids"])
    cam_by_uid = {c.uid: c for c in system.cameras}
    m.keyframes = [
        (cam_by_uid[uid],
         jax.tree.map(jnp.asarray, cam), keymap)
        for uid, cam, keymap in mp["keyframes"]]
    m.processed_frames = [
        (jax.tree.map(jnp.asarray, c), jax.tree.map(jnp.asarray, fm))
        for c, fm in mp["processed_frames"]]
    m.last_reports = dict(mp["last_reports"])
    m._cached_counts = None
    m.model_map = None

    tr = host["tracker"]
    t = system.tracker
    t.pose_es = [np.asarray(p) for p in tr["pose_es"]]
    t.pose_gt = [np.asarray(p) for p in tr["pose_gt"]]
    t.timestamps = list(tr["timestamps"])
    t.icp_fail_count = tr["icp_fail_count"]
    t._last_pyr = None  # re-seeded from the resumed frame's render
    t._curr_pyr = None

    if host.get("recorder") is not None:
        means, counts = host["recorder"]
        system.recorder.means.update(means)
        system.recorder.counts.update(counts)
    system.metrics_history = list(host["metrics_history"])
    if host.get("objects") is not None:
        system.object_layer = host["objects"]
    # replay estimated poses onto the camera objects already consumed
    for fid, p in enumerate(t.pose_es):
        if fid < len(system.cameras):
            system.cameras[fid].update_pose(p)
    return m.time
