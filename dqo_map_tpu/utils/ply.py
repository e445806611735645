"""Binary PLY IO for Gaussian maps — no external plyfile dependency.

Matches the reference's attribute layout exactly
(`gaussian_pointcloud.py:572-684`): x y z nx ny nz f_dc_0..2 f_rest_0..44
opacity scale_0..2 rot_0..3 [confidence], little-endian float32, so models
interchange with the reference's save/load and SIBR viewers.
"""

from __future__ import annotations

import io
import os
from typing import Optional

import numpy as np


def _attribute_names(sh_rest: int, include_confidence: bool):
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(sh_rest * 3)]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]
    if include_confidence:
        names.append("confidence")
    return names


def write_gaussian_ply(path: str, xyz, f_dc, f_rest, opacity, scaling,
                       rotation, confidence: Optional[np.ndarray] = None):
    """f_dc (P,3); f_rest (P,K-1,3) stored channel-major like the reference
    (features (P,3,K-1) flattened)."""
    P = xyz.shape[0]
    sh_rest = f_rest.shape[1]
    names = _attribute_names(sh_rest, confidence is not None)
    cols = [
        xyz, np.zeros_like(xyz),
        f_dc.reshape(P, 3),
        np.transpose(f_rest, (0, 2, 1)).reshape(P, -1),  # channel-major
        opacity.reshape(P, 1), scaling.reshape(P, 3), rotation.reshape(P, 4),
    ]
    if confidence is not None:
        cols.append(confidence.reshape(P, 1))
    data = np.concatenate([np.asarray(c, np.float32) for c in cols], axis=1)
    assert data.shape[1] == len(names)

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    header = io.StringIO()
    header.write("ply\nformat binary_little_endian 1.0\n")
    header.write(f"element vertex {P}\n")
    for n in names:
        header.write(f"property float {n}\n")
    header.write("end_header\n")
    with open(path, "wb") as f:
        f.write(header.getvalue().encode("ascii"))
        f.write(np.ascontiguousarray(data, "<f4").tobytes())


def read_gaussian_ply(path: str):
    """Returns dict with xyz, f_dc (P,3), f_rest (P,K-1,3), opacity, scaling,
    rotation, confidence (zeros if absent)."""
    with open(path, "rb") as f:
        raw = f.read()
    hdr_end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:hdr_end].decode("ascii").splitlines()
    names = []
    count = 0
    fmt_binary = True
    for line in header:
        parts = line.split()
        if parts[0] == "element" and parts[1] == "vertex":
            count = int(parts[2])
        elif parts[0] == "property":
            names.append(parts[2])
        elif parts[0] == "format" and parts[1] == "ascii":
            fmt_binary = False
    if fmt_binary:
        data = np.frombuffer(raw[hdr_end:], "<f4",
                             count=count * len(names)).reshape(count, len(names))
    else:
        data = np.loadtxt(io.StringIO(raw[hdr_end:].decode()),
                          dtype=np.float32).reshape(count, len(names))
    col = {n: data[:, i] for i, n in enumerate(names)}
    rest_names = sorted([n for n in names if n.startswith("f_rest_")],
                        key=lambda s: int(s.split("_")[-1]))
    n_rest = len(rest_names) // 3
    f_rest = np.stack([col[n] for n in rest_names], axis=1)
    f_rest = f_rest.reshape(count, 3, n_rest).transpose(0, 2, 1)
    return {
        "xyz": np.stack([col["x"], col["y"], col["z"]], 1),
        "f_dc": np.stack([col[f"f_dc_{i}"] for i in range(3)], 1),
        "f_rest": f_rest,
        "opacity": col["opacity"],
        "scaling": np.stack([col[f"scale_{i}"] for i in range(3)], 1),
        "rotation": np.stack([col[f"rot_{i}"] for i in range(4)], 1),
        "confidence": col.get("confidence", np.zeros(count, np.float32)),
    }


def save_map_ply(state, path: str, subset: str = "global",
                 include_confidence: bool = True):
    """Save a MapState subset in the reference layout
    (ref `save_model_ply`, gaussian_pointcloud.py:641-684)."""
    status = np.asarray(state.status)
    if subset == "global":
        mask = status != 0
    elif subset == "unstable":
        mask = status == 1
    elif subset == "stable":
        mask = status == 2
    else:
        raise ValueError(subset)
    if mask.sum() == 0:
        return
    sh = np.asarray(state.sh)[mask]
    write_gaussian_ply(
        path,
        np.asarray(state.xyz)[mask],
        sh[:, 0, :],
        sh[:, 1:, :],
        np.asarray(state.opacity)[mask],
        np.asarray(state.scaling)[mask],
        np.asarray(state.rotation)[mask],
        np.asarray(state.confidence)[mask] if include_confidence else None,
    )


def load_map_ply(path: str, capacity: int, status_value: int = 2):
    """Rebuild a MapState from a PLY (offline eval / resume,
    ref `GaussianPointCloud.load`, gaussian_pointcloud.py:132-207)."""
    import jax.numpy as jnp
    from ..models import gaussian_map as gm

    d = read_gaussian_ply(path)
    P = d["xyz"].shape[0]
    assert P <= capacity, f"{P} gaussians > capacity {capacity}"
    state = gm.empty_map(capacity)
    sh = np.zeros((P, gm.SH_K, 3), np.float32)
    sh[:, 0, :] = d["f_dc"]
    sh[:, 1:1 + d["f_rest"].shape[1], :] = d["f_rest"]

    def put(arr, val, fill=None):
        out = np.asarray(arr).copy()
        out[:P] = val
        return jnp.asarray(out)

    return state._replace(
        xyz=put(state.xyz, d["xyz"]), sh=put(state.sh, sh),
        scaling=put(state.scaling, d["scaling"]),
        rotation=put(state.rotation, d["rotation"]),
        opacity=put(state.opacity, d["opacity"]),
        confidence=put(state.confidence, d["confidence"]),
        status=put(state.status, status_value),
        count=np.int32(P),
    )
