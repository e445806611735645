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
                 include_confidence: bool = True,
                 mask: Optional[np.ndarray] = None):
    """Save a MapState subset in the reference layout
    (ref `save_model_ply`, gaussian_pointcloud.py:641-684). An explicit
    `mask` (over slots) intersects the subset — used for the per-object
    model exports (ref saves `*obj*` PLYs per object id)."""
    status = np.asarray(state.status)
    if subset == "global":
        smask = status != 0
    elif subset == "unstable":
        smask = status == 1
    elif subset == "stable":
        smask = status == 2
    else:
        raise ValueError(subset)
    mask = smask if mask is None else (smask & np.asarray(mask))
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


def read_mesh_ply(path: str):
    """Read a triangle-mesh PLY (ascii or binary little-endian): returns
    (verts (N,3) float32, faces (M,3) int64 or None for point clouds).
    Handles the common float/double x y z [+extras] vertex layouts and
    uchar-count face lists — enough for GT meshes (e.g. RO-MAP gt_mesh/*.ply)
    without an open3d dependency."""
    with open(path, "rb") as f:
        raw = f.read()
    hdr_end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:hdr_end].decode("ascii", "replace").splitlines()
    fmt = "binary_little_endian"
    elems = []          # [(name, count, [(type, prop) or ("list", ct, it)])]
    cur = None
    for line in header:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            cur = (parts[1], int(parts[2]), [])
            elems.append(cur)
        elif parts[0] == "property" and cur is not None:
            if parts[1] == "list":
                cur[2].append(("list", parts[2], parts[3]))
            else:
                cur[2].append((parts[1], parts[2]))

    np_t = {"float": "<f4", "float32": "<f4", "double": "<f8",
            "float64": "<f8", "uchar": "u1", "uint8": "u1", "char": "i1",
            "int8": "i1", "short": "<i2", "ushort": "<u2", "int": "<i4",
            "int32": "<i4", "uint": "<u4", "uint32": "<u4"}

    verts, faces = None, None
    if fmt == "ascii":
        text = raw[hdr_end:].decode("ascii", "replace").split("\n")
        li = 0
        for name, count, props in elems:
            rows = text[li:li + count]
            li += count
            if name == "vertex":
                arr = np.array([r.split()[:len(props)] for r in rows],
                               np.float32)
                verts = arr[:, :3]
            elif name == "face":
                fl = [list(map(int, r.split())) for r in rows]
                faces = np.array([r[1:4] for r in fl if r and r[0] >= 3],
                                 np.int64)
    else:
        off = hdr_end
        for name, count, props in elems:
            if name == "vertex":
                dt = np.dtype([(f"p{i}", np_t[t]) for i, (t, _) in
                               enumerate(props)])
                arr = np.frombuffer(raw, dt, count=count, offset=off)
                off += dt.itemsize * count
                verts = np.stack([arr["p0"], arr["p1"], arr["p2"]],
                                 1).astype(np.float32)
            elif name == "face" and props and props[0][0] == "list":
                _, ct, it = props[0]
                cdt, idt = np.dtype(np_t[ct]), np.dtype(np_t[it])
                out = []
                for _ in range(count):
                    n = int(np.frombuffer(raw, cdt, 1, off)[0])
                    off += cdt.itemsize
                    idxs = np.frombuffer(raw, idt, n, off)
                    off += idt.itemsize * n
                    if n >= 3:
                        out.append(idxs[:3])
                faces = np.asarray(out, np.int64)
            else:
                # skip unknown fixed-size element
                dt = np.dtype([(f"p{i}", np_t[t]) for i, (t, _) in
                               enumerate(props) if t != "list"])
                off += dt.itemsize * count
    return verts, (faces if faces is not None and len(faces) else None)


def densify_point_cloud(state, sigma: int = 1, circle_num: int = 30,
                        levels: int = 5, subset: str = "stable",
                        seed: int = 0):
    """Disc-densified point cloud from the splat ellipses (ref
    `gaussian_pointcloud.densify`, gaussian_pointcloud.py:67-130 — the
    `pcd_densify.ply` snapshot written at end of run, slam.py:203-206).

    Each gaussian contributes circle_num*levels*sigma points sampled on
    concentric rings of its major-plane ellipse, with the disc normal
    attached. Vectorized numpy on host (one-shot export, off the hot path).
    Returns (points (M,3) float32, normals (M,3) float32)."""
    from ..utils.math3d import quat_to_rotmat
    import jax.numpy as jnp
    import numpy as _np

    status = _np.asarray(state.status)
    mask = (status == 2) if subset == "stable" else (status != 0)
    if mask.sum() == 0:
        return (_np.zeros((0, 3), _np.float32),) * 2
    xyz = _np.asarray(state.xyz)[mask]
    scales = _np.asarray(state.get_scaling())[mask]
    R = _np.asarray(quat_to_rotmat(jnp.asarray(
        _np.asarray(state.get_rotation())[mask])))        # (P,3,3) columns=axes
    order = _np.argsort(scales, axis=1)                   # ascending
    P = xyz.shape[0]
    ar = _np.arange(P)
    normal = R[ar, :, order[:, 0]]
    plane0 = R[ar, :, order[:, 1]]
    plane1 = R[ar, :, order[:, 2]]
    axis0 = scales[ar, order[:, 1]][:, None]
    axis1 = scales[ar, order[:, 2]][:, None]

    rng = _np.random.default_rng(seed)
    theta = _np.tile(rng.uniform(0, 2 * _np.pi, (1, circle_num)),
                     (1, levels * sigma))                 # (1, C*L*S)
    radii = _np.concatenate([
        _np.repeat((_np.arange(levels) + 0.5) / levels, circle_num)
        + s for s in range(sigma)])[None]                 # (1, C*L*S)
    a = axis0 * radii
    b = axis1 * radii
    pts = (xyz[:, None, :]
           + (a * _np.cos(theta))[..., None] * plane0[:, None, :]
           + (b * _np.sin(theta))[..., None] * plane1[:, None, :])
    nrm = _np.broadcast_to(normal[:, None, :], pts.shape)
    return (pts.reshape(-1, 3).astype(_np.float32),
            nrm.reshape(-1, 3).astype(_np.float32))


def write_point_normal_ply(path: str, points: np.ndarray,
                           normals: np.ndarray):
    """x y z nx ny nz binary PLY (the pcd_densify.ply format)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = np.concatenate([np.asarray(points, np.float32),
                           np.asarray(normals, np.float32)], axis=1)
    header = io.StringIO()
    header.write("ply\nformat binary_little_endian 1.0\n")
    header.write(f"element vertex {data.shape[0]}\n")
    for n in ("x", "y", "z", "nx", "ny", "nz"):
        header.write(f"property float {n}\n")
    header.write("end_header\n")
    with open(path, "wb") as f:
        f.write(header.getvalue().encode("ascii"))
        f.write(np.ascontiguousarray(data, "<f4").tobytes())
