"""Loss/metric functions: L1/L2, SSIM (11x11 Gaussian window), PSNR.

Pure-JAX equivalents of `utils/loss_utils.py`. Images are channel-first
(C,H,W) for ssim (matching the reference call sites) and any-shape for l1/l2.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
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


@jax.jit
def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img1 - img2) ** 2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


@lru_cache(maxsize=4)
def _gaussian_taps(window_size: int, sigma: float):
    """1-D Gaussian taps as NUMPY (cached values must not be traced arrays —
    a jnp constant created inside a jit leaks its tracer into later traces)."""
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_window(window_size: int, sigma: float):
    g = _gaussian_taps(window_size, sigma)
    return jnp.asarray(np.outer(g, g))


def _blur_separable(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Separable SAME-padded Gaussian blur of (..., H, W) via shift-and-add.

    TPU lowers small depthwise convs (3 channels of an 11x11 window) to
    near-scalar MXU work — the 2x11-tap shift form is pure VPU streaming,
    ~50x faster fwd and bwd (shifts transpose to shifts).
    """
    k = len(taps)
    r = k // 2
    H, W = x.shape[-2], x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(r, r), (0, 0)])
    y = 0.0
    for i in range(k):
        y = y + taps[i] * jax.lax.slice_in_dim(xp, i, i + H, axis=x.ndim - 2)
    yp = jnp.pad(y, [(0, 0)] * (x.ndim - 2) + [(0, 0), (r, r)])
    z = 0.0
    for i in range(k):
        z = z + taps[i] * jax.lax.slice_in_dim(yp, i, i + W, axis=x.ndim - 1)
    return z


@partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over a (C,H,W) pair with SAME padding, matching
    `utils/loss_utils.py:62-100` (window sigma 1.5, C1=0.01^2, C2=0.03^2).

    All five window means run as ONE stacked separable blur; zero-padded
    borders match the reference's conv2d SAME-padding semantics exactly.

    Jitted at the def site: callers outside jit (bench/CLI eval) would
    otherwise dispatch ~50 eager micro programs per call — each one a
    compile + roundtrip on the tunneled TPU backend. Inside an outer jit
    the nested jit inlines, so hot-loop users are unaffected.
    """
    taps = _gaussian_taps(window_size, 1.5)
    stacked = jnp.stack(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0)
    m = _blur_separable(stacked, taps)
    mu1, mu2 = m[0], m[1]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = m[2] - mu1_sq
    sigma2_sq = m[3] - mu2_sq
    sigma12 = m[4] - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return ssim_map.mean()


@partial(jax.jit, static_argnames=("levels",))
def ms_ssim(img1: jnp.ndarray, img2: jnp.ndarray, levels: int = 5) -> jnp.ndarray:
    """Multi-scale SSIM ((C,H,W)), standard weights, for eval parity with
    pytorch_msssim (ref `SLAM/eval.py`). Levels adapt down when the image is
    too small for 5 halvings (the 11-tap window needs >=11 px per side), so
    small eval crops score with fewer scales instead of failing."""
    H, W = img1.shape[-2:]
    max_lv = 1
    side = min(H, W)
    while max_lv < levels and (side >> 1) >= 11:
        side >>= 1
        max_lv += 1
    levels = min(levels, max_lv)
    weights = jnp.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])[:levels]
    weights = weights / weights.sum()

    def downsample(x):
        C, H, W = x.shape
        Hc, Wc = H - H % 2, W - W % 2
        x = x[:, :Hc, :Wc]
        return x.reshape(C, Hc // 2, 2, Wc // 2, 2).mean(axis=(2, 4))

    mcs = []
    val = None
    a, b = img1, img2
    taps = _gaussian_taps(11, 1.5)
    for i in range(levels):
        # contrast*structure component
        m = _blur_separable(jnp.stack([a, b, a * a, b * b, a * b], 0), taps)
        mu1, mu2 = m[0], m[1]
        s1 = m[2] - mu1 * mu1
        s2 = m[3] - mu2 * mu2
        s12 = m[4] - mu1 * mu2
        C1v, C2v = 0.01**2, 0.03**2
        cs = ((2 * s12 + C2v) / (s1 + s2 + C2v)).mean()
        l = ((2 * mu1 * mu2 + C1v) / (mu1 * mu1 + mu2 * mu2 + C1v)).mean()
        if i == levels - 1:
            val = l
        mcs.append(jnp.maximum(cs, 0.0))
        a, b = downsample(a), downsample(b)
    mcs = jnp.stack(mcs)
    return jnp.prod(mcs[:-1] ** weights[:-1]) * (val ** weights[-1])
