"""Loss/metric functions: L1/L2, SSIM (11x11 Gaussian window), PSNR.

Pure-JAX equivalents of `utils/loss_utils.py`. Images are channel-first
(C,H,W) for ssim (matching the reference call sites) and any-shape for l1/l2.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(a - b).mean()


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return ((a - b) ** 2).mean()


def masked_l1(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of |a-b| over mask==True elements (0 if empty mask)."""
    m = mask.astype(a.dtype)
    while m.ndim < a.ndim:
        m = m[..., None]
    num = (jnp.abs(a - b) * m).sum()
    den = m.sum() * (a.size / max(1, int(np.prod(mask.shape))))
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-12), 0.0)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img1 - img2) ** 2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


@lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float):
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return jnp.asarray(w2d)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over a (C,H,W) pair with SAME padding, matching
    `utils/loss_utils.py:62-100` (window sigma 1.5, C1=0.01^2, C2=0.03^2)."""
    C = img1.shape[0]
    w = _gaussian_window(window_size, 1.5)
    kern = jnp.broadcast_to(w[None, None], (C, 1, window_size, window_size))

    def conv(x):
        return jax.lax.conv_general_dilated(
            x[None], kern, (1, 1), "SAME", feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST,
        )[0]

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return ssim_map.mean()


def ms_ssim(img1: jnp.ndarray, img2: jnp.ndarray, levels: int = 5) -> jnp.ndarray:
    """Multi-scale SSIM ((C,H,W)), standard weights, for eval parity with
    pytorch_msssim (ref `SLAM/eval.py`)."""
    weights = jnp.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])[:levels]

    def downsample(x):
        C, H, W = x.shape
        Hc, Wc = H - H % 2, W - W % 2
        x = x[:, :Hc, :Wc]
        return x.reshape(C, Hc // 2, 2, Wc // 2, 2).mean(axis=(2, 4))

    mcs = []
    val = None
    a, b = img1, img2
    for i in range(levels):
        # contrast*structure component
        C = a.shape[0]
        w = _gaussian_window(11, 1.5)
        kern = jnp.broadcast_to(w[None, None], (C, 1, 11, 11))

        def conv(x):
            return jax.lax.conv_general_dilated(
                x[None], kern, (1, 1), "SAME", feature_group_count=C,
                precision=jax.lax.Precision.HIGHEST)[0]

        mu1, mu2 = conv(a), conv(b)
        s1 = conv(a * a) - mu1 * mu1
        s2 = conv(b * b) - mu2 * mu2
        s12 = conv(a * b) - mu1 * mu2
        C1v, C2v = 0.01**2, 0.03**2
        cs = ((2 * s12 + C2v) / (s1 + s2 + C2v)).mean()
        l = ((2 * mu1 * mu2 + C1v) / (mu1 * mu1 + mu2 * mu2 + C1v)).mean()
        if i == levels - 1:
            val = l
        mcs.append(jnp.maximum(cs, 0.0))
        a, b = downsample(a), downsample(b)
    mcs = jnp.stack(mcs)
    return jnp.prod(mcs[:-1] ** weights[:-1]) * (val ** weights[-1])
