"""Sequential numpy oracle of the reference rasterizer semantics.

A direct, slow transcription of the per-pixel loop in
`cuda_rasterizer/forward.cu:638-866` (renderCUDA_withMask) plus
`preprocessCUDA`, used only to validate the vectorized JAX/Pallas
implementation on tiny scenes.
"""

import numpy as np


def quat_to_R(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def oracle_render(means3d, scales, rots, opacities, colors, w2c, full_proj, K,
                  width, height, tile_size=16, color_sigma=3.0,
                  opaque_threshold=0.6, depth_threshold=1.0,
                  normal_threshold=0.5, T_threshold=1e-4, tan_fovx=None,
                  tan_fovy=None, tile_mask=None, max_tiles_per_gaussian=1000):
    P = means3d.shape[0]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    if tan_fovx is None:
        tan_fovx = width / (2 * fx)
    if tan_fovy is None:
        tan_fovy = height / (2 * fy)

    # ---- preprocess ----
    valid = np.zeros(P, bool)
    xy = np.zeros((P, 2))
    conic = np.zeros((P, 3))
    depth = np.zeros(P)
    radius = np.zeros(P)
    mean_c = np.zeros((P, 3))
    normal_c = np.zeros((P, 3))
    scale_max = np.zeros(P)
    for i in range(P):
        p = means3d[i]
        pv = w2c[:3, :3] @ p + w2c[:3, 3]
        ph = full_proj[:, :3] @ p + full_proj[:, 3]
        pw = 1.0 / (ph[3] + 1e-7)
        pp = ph[:3] * pw
        if pv[2] <= 0.2 or abs(pp[0]) > 1.3 or abs(pp[1]) > 1.3:
            continue
        R = quat_to_R(rots[i])
        S2 = np.diag(scales[i] ** 2)
        Sigma = R @ S2 @ R.T
        # cov2D with clamped view point
        limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
        tz = pv[2]
        tx = np.clip(pv[0] / tz, -limx, limx) * tz
        ty = np.clip(pv[1] / tz, -limy, limy) * tz
        J = np.array([[fx / tz, 0, -fx * tx / tz**2], [0, fy / tz, -fy * ty / tz**2]])
        Wm = w2c[:3, :3]
        cov = J @ Wm @ Sigma @ Wm.T @ J.T
        a, b, c = cov[0, 0] + 0.3, cov[0, 1], cov[1, 1] + 0.3
        det = a * c - b * b
        if det == 0:
            continue
        conic[i] = [c / det, -b / det, a / det]
        mid = 0.5 * (a + c)
        lam = mid + np.sqrt(max(0.1, mid * mid - det))
        radius[i] = np.ceil(color_sigma * np.sqrt(lam))
        xy[i] = [pp[0] * width * 0.5 + cx, pp[1] * height * 0.5 + cy]
        depth[i] = pv[2]
        mean_c[i] = pv
        ax = np.argmin(scales[i])
        normal_c[i] = Wm @ R[:, ax]
        scale_max[i] = scales[i].max()
        valid[i] = True

    TH = (height + tile_size - 1) // tile_size
    TW = (width + tile_size - 1) // tile_size

    # ---- binning (per-tile depth-sorted lists, row-major slot order w/ cap) ----
    tiles = [[] for _ in range(TH * TW)]
    order = np.argsort(depth, kind="stable")
    for i in order:
        if not valid[i]:
            continue
        x0 = int(min(TW, max(0, (xy[i, 0] - radius[i]) // tile_size)))
        y0 = int(min(TH, max(0, (xy[i, 1] - radius[i]) // tile_size)))
        x1 = int(min(TW, max(0, (xy[i, 0] + radius[i] + tile_size - 1) // tile_size)))
        y1 = int(min(TH, max(0, (xy[i, 1] + radius[i] + tile_size - 1) // tile_size)))
        rw = x1 - x0
        slot = 0
        for dy in range(y0, y1):
            for dx in range(x0, x1):
                if slot >= max_tiles_per_gaussian:
                    break
                if tile_mask is not None and not tile_mask[dy, dx]:
                    slot += 1
                    continue
                tiles[dy * TW + dx].append(i)
                slot += 1

    # ---- per-pixel sequential blend ----
    out = {
        "render": np.zeros((height, width, 3)),
        "depth": np.zeros((height, width)),
        "depth_index_map": -np.ones((height, width), np.int64),
        "color_index_map": -np.ones((height, width), np.int64),
        "color_hit_weight": np.zeros((height, width)),
        "depth_hit_weight": np.zeros((height, width)),
        "T_map": np.ones((height, width)),
        "weight_sum": np.zeros((height, width)),
        "n_touched": np.zeros(P, np.int64),
    }
    for ty in range(TH):
        for txx in range(TW):
            if tile_mask is not None and not tile_mask[ty, txx]:
                continue
            plist = tiles[ty * TW + txx]
            for py in range(ty * tile_size, min((ty + 1) * tile_size, height)):
                for px in range(txx * tile_size, min((txx + 1) * tile_size, width)):
                    ray = np.array([(px - cx) / fx, (py - cy) / fy, 1.0])
                    ray = ray / np.linalg.norm(ray)
                    T = 1.0
                    end_T = 1.0
                    C = np.zeros(3)
                    wsum = 0.0
                    hit = False
                    d_out = 0.0
                    hit_id = -1
                    best_id = -1
                    best_w = -1.0
                    hit_dw = 0.0
                    best_w_out = 0.0
                    for g in plist:
                        dxy = xy[g] - np.array([px, py], float)
                        power = (
                            -0.5 * (conic[g, 0] * dxy[0] ** 2 + conic[g, 2] * dxy[1] ** 2)
                            - conic[g, 1] * dxy[0] * dxy[1]
                        )
                        if power > 0:
                            continue
                        alpha = min(0.99, opacities[g] * np.exp(power))
                        if alpha < 1.0 / 255.0:
                            continue
                        if (not hit) and alpha >= opaque_threshold:
                            nc = normal_c[g]
                            t = (mean_c[g] @ nc) / (ray @ nc + 1e-8)
                            hz = t * ray[2]
                            dd = abs(hz - mean_c[g][2])
                            ad = abs(ray @ nc)
                            hit_dw = alpha * T
                            if dd <= scale_max[g] * depth_threshold and ad >= normal_threshold:
                                d_out = hz
                            else:
                                d_out = depth[g]
                            hit_id = g
                            hit = True
                        test_T = T * (1 - alpha)
                        if test_T < T_threshold and hit:
                            break
                        if test_T >= T_threshold:
                            w = alpha * T
                            wsum += w
                            C += colors[g] * w
                            if w > best_w:
                                best_w = w
                                best_id = g
                                best_w_out = w
                            if test_T > 0.5:
                                out["n_touched"][g] += 1
                            end_T = test_T
                        T = test_T
                    out["render"][py, px] = C
                    out["depth"][py, px] = d_out
                    out["depth_index_map"][py, px] = hit_id
                    out["color_index_map"][py, px] = best_id
                    out["color_hit_weight"][py, px] = best_w_out
                    out["depth_hit_weight"][py, px] = hit_dw
                    out["T_map"][py, px] = end_T
                    out["weight_sum"][py, px] = wsum
    return out
