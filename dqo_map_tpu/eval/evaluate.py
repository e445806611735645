"""Render-quality + geometry evaluation.

Equivalent of `SLAM/eval.py`: PSNR / SSIM / MS-SSIM / depth-L1 with image
dumps, plus point-cloud accuracy metrics vs a GT mesh sampling
(`eval_pcd`, eval.py:228-282). LPIPS is provided via torchmetrics when the
(CPU) torch stack is available and silently skipped otherwise.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.losses import l1_loss, ms_ssim, psnr, ssim

_lpips_fn = None
_warned_msssim = False
_warned_lpips = False


def _lpips(img1: np.ndarray, img2: np.ndarray) -> Optional[float]:
    """LPIPS(alex) on (H,W,3) float arrays; None if torch stack missing."""
    global _lpips_fn
    try:
        if _lpips_fn is None:
            import torch
            from torchmetrics.image.lpip import (
                LearnedPerceptualImagePatchSimilarity,
            )
            _lpips_fn = LearnedPerceptualImagePatchSimilarity(
                net_type="alex", normalize=True)
        import torch
        a = torch.from_numpy(np.transpose(img1, (2, 0, 1))[None]).float()
        b = torch.from_numpy(np.transpose(img2, (2, 0, 1))[None]).float()
        return float(_lpips_fn(a.clamp(0, 1), b.clamp(0, 1)))
    except Exception as e:
        global _warned_lpips
        if not _warned_lpips:
            print(f"[eval] LPIPS unavailable ({type(e).__name__}: {e}); "
                  "omitting the metric")
            _warned_lpips = True
        return None


@jax.jit
def _depth_metrics(depth, index, gtd, min_depth, max_depth):
    """Depth-L1 (m) + valid-pixel ratio in ONE compiled program (eager
    per-op dispatch costs a tunnel roundtrip compile each on the TPU
    backend)."""
    valid_range = (gtd > min_depth) & (gtd < max_depth)
    gtd = jnp.where(valid_range, gtd, 0.0)
    invalid = (index == -1) | (gtd == 0)
    derr = jnp.where(invalid, 0.0, jnp.abs(gtd - depth))
    nvalid = (~invalid).sum()
    return (derr.sum() / jnp.maximum(nvalid, 1),
            nvalid / invalid.size, gtd)


def eval_picture(render_output: dict, gt_color: np.ndarray,
                 gt_depth: np.ndarray, min_depth: float, max_depth: float,
                 save_path: Optional[str] = None, with_lpips: bool = False):
    """(ref `eval_picture`, SLAM/eval.py:38-188). Depth-L1 reported in cm."""
    image = jnp.asarray(render_output["render"])
    depth = jnp.asarray(render_output["depth"])
    index = jnp.asarray(render_output["depth_index_map"])
    gt_img = jnp.asarray(gt_color)

    psnr_v = float(psnr(gt_img, image))
    ssim_v = float(ssim(jnp.transpose(image, (2, 0, 1)),
                        jnp.transpose(gt_img, (2, 0, 1))))
    try:
        msssim_v = float(ms_ssim(jnp.transpose(image, (2, 0, 1)),
                                 jnp.transpose(gt_img, (2, 0, 1))))
    except Exception as e:
        global _warned_msssim
        if not _warned_msssim:
            print(f"[eval] ms_ssim unavailable ({e}); reporting NaN")
            _warned_msssim = True
        msssim_v = float("nan")
    color_l1 = float(l1_loss(gt_img, image))

    dl1, vratio, gtd = _depth_metrics(depth, index, jnp.asarray(gt_depth),
                                      min_depth, max_depth)
    depth_l1_cm = float(dl1) * 100
    valid_ratio = float(vratio)

    metrics = {
        "psnr": psnr_v, "ssim": ssim_v, "ms_ssim": msssim_v,
        "color_l1": color_l1, "depth_l1_cm": depth_l1_cm,
        "valid_ratio": valid_ratio,
    }
    # the reference reports LPIPS(alex) on every eval (SLAM/eval.py:60-185);
    # the key is ALWAYS present so downstream tables never silently lose the
    # column — None + reason when the torch/torchmetrics stack (or its
    # pretrained AlexNet weights) is unavailable in this environment.
    lp = _lpips(np.asarray(image), np.asarray(gt_img)) if with_lpips else None
    metrics["lpips"] = lp
    if lp is None:
        metrics["lpips_note"] = (
            "not computed" if not with_lpips else
            "torchmetrics/pretrained-AlexNet unavailable (offline env)")

    if save_path:
        os.makedirs(save_path, exist_ok=True)
        from PIL import Image
        err = np.abs(np.asarray(image) - np.asarray(gt_img))
        strip = np.concatenate(
            [np.asarray(image), np.asarray(gt_img), err], axis=1)
        Image.fromarray(
            (np.clip(strip, 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(save_path, "color_compare.jpg"))
        dmax = max(float(gtd.max()), 1e-6)
        dstrip = np.concatenate(
            [np.asarray(depth), np.asarray(gtd)], axis=1) / dmax
        Image.fromarray(
            (np.clip(dstrip, 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(save_path, "depth_compare.jpg"))
    return metrics


def eval_frame(mapping, frame, save_path: Optional[str] = None,
               min_depth: float = 0.3, max_depth: float = 5.0,
               save_picture: bool = False, run_pcd: bool = False,
               gt_mesh_points: Optional[np.ndarray] = None):
    """(ref `eval_frame`, SLAM/eval.py:285-366)."""
    out = mapping.get_render_output(frame.render_inputs())
    metrics = eval_picture(
        out, frame.image, frame.depth, min_depth, max_depth,
        save_path if save_picture else None)
    if run_pcd and gt_mesh_points is not None:
        metrics.update(eval_pcd(
            np.asarray(mapping.state.xyz)[np.asarray(mapping.state.status) != 0],
            gt_mesh_points))
    return metrics


def eval_pcd(points: np.ndarray, gt_points: np.ndarray,
             threshold: float = 0.03, sample: int = 200_000, seed: int = 0):
    """Chamfer / accuracy / completion / P/R/F1 between point sets
    (ref `eval_pcd`, SLAM/eval.py:228-282). Distances via the TPU KNN op."""
    import jax.numpy as jnp
    from ..ops.knn import knn

    rng = np.random.default_rng(seed)
    if len(points) > sample:
        points = points[rng.choice(len(points), sample, replace=False)]
    if len(gt_points) > sample:
        gt_points = gt_points[rng.choice(len(gt_points), sample, replace=False)]
    p = jnp.asarray(points, jnp.float32)
    g = jnp.asarray(gt_points, jnp.float32)
    d_pg, _ = knn(p, g, jnp.ones(len(gt_points), bool), k=1)
    d_gp, _ = knn(g, p, jnp.ones(len(points), bool), k=1)
    acc = float(jnp.sqrt(d_pg).mean())       # accuracy: pred -> gt
    comp = float(jnp.sqrt(d_gp).mean())      # completion: gt -> pred
    precision = float((jnp.sqrt(d_pg) < threshold).mean())
    recall = float((jnp.sqrt(d_gp) < threshold).mean())
    f1 = 2 * precision * recall / max(precision + recall, 1e-8)
    return {
        "chamfer_cm": (acc + comp) / 2 * 100, "accuracy_cm": acc * 100,
        "completion_cm": comp * 100, "precision": precision,
        "recall": recall, "f1": f1,
    }
