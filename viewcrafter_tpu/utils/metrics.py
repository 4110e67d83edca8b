"""Quality metrics for the eval protocol (PSNR / SSIM / LPIPS).

The reference computes these offline, outside its repo (README.md:171-177;
`single_view_eval` only emits videos). We ship them so `scripts/compute_metrics.py`
closes the loop on `test/eval1`-style comparisons.

PSNR/SSIM are jnp implementations (SSIM per Wang et al. 2004, the standard
11x11 Gaussian, matching skimage defaults for float images). LPIPS uses the
standard AlexNet-backbone formulation; the backbone + linear-head weights load
from a user-supplied .pth (no network egress here) — without them
`lpips_available()` is False and callers skip the metric.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Mean PSNR over leading batch axes; a, b in [0, data_range]."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2, axis=(-3, -2, -1))
    return 10.0 * jnp.log10(data_range**2 / jnp.clip(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """SSIM (11x11 Gaussian window, K1=0.01, K2=0.03), mean over image;
    inputs (..., H, W, C) in [0, data_range]."""
    k = _gaussian_kernel()[..., None, None]  # (11, 11, 1, 1)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    def filt(x):
        # depthwise conv per channel
        xt = jnp.moveaxis(x.astype(jnp.float32), -1, 0)[..., None]  # (C, ..., H, W, 1)
        sh = xt.shape
        flat = xt.reshape((-1,) + sh[-3:])
        out = jax.lax.conv_general_dilated(
            flat, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        out = out.reshape(sh[:-3] + out.shape[-3:])
        return jnp.moveaxis(out[..., 0], 0, -1)

    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a**2, mu_b**2, mu_a * mu_b
    # (co)variances on globally re-centered inputs: Var(x) = E[(x-c)^2] -
    # (E[x]-c)^2 for any constant c — with c ≈ the image mean the two terms
    # are small instead of ~mu^2, avoiding the f32 cancellation that made
    # smooth low-variance images read SSIM > 1 (E[x^2]-mu^2 with both ~0.25
    # and sigma^2 ~ 1e-6 loses to c2 = 9e-4)
    ca = jnp.mean(a, axis=(-3, -2, -1), keepdims=True).astype(jnp.float32)
    cb = jnp.mean(b, axis=(-3, -2, -1), keepdims=True).astype(jnp.float32)
    am, bm = a - ca, b - cb
    da, db = mu_a - ca, mu_b - cb
    sa = filt(am * am) - da**2
    sb = filt(bm * bm) - db**2
    sab = filt(am * bm) - da * db
    s = ((2 * mu_ab + c1) * (2 * sab + c2)) / ((mu_a2 + mu_b2 + c1) * (sa + sb + c2))
    return jnp.mean(s, axis=(-3, -2, -1))


# ---------------------------------------------------------------------------
# LPIPS (AlexNet backbone; weights supplied externally)
# ---------------------------------------------------------------------------

_ALEX_LAYOUT = [  # (out_ch, kernel, stride, pad)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after conv1, conv2 (and features tap before relu? after relu)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_LPIPS_WEIGHTS: Optional[Dict] = None

# torchvision alexnet.features conv indices; the lpips package wraps them in
# slice modules keeping the original numbering (lpips/pretrained_networks.py):
# slice1.0, slice2.3, slice3.6, slice4.8, slice5.10
_ALEX_CONV_IDX = [0, 3, 6, 8, 10]


def _resolve_lpips_arrays(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Normalize any of the three layouts seen in the wild to
    {conv{i}.weight/bias, lin{i}.weight}:
      (a) full lpips.LPIPS(net='alex') state dict:
          net.slice{k}.{n}.weight + lin{i}.model.1.weight + scaling_layer.*
      (b) the official lin-only file (lpips/weights/v0.1/alex.pth):
          lin{i}.model.1.weight  (backbone must be merged in from (c))
      (c) torchvision alexnet: features.{n}.weight
    Raises KeyError naming what's missing — no silent fallback."""
    out: Dict[str, np.ndarray] = {}
    for i, n in enumerate(_ALEX_CONV_IDX):
        cands = [f"net.slice{i+1}.{n}.weight", f"features.{n}.weight", f"net.features.{n}.weight"]
        key = next((c for c in cands if c in sd), None)
        if key is None:
            raise KeyError(
                f"LPIPS: no AlexNet conv{i} weight under any of {cands}; "
                "supply a full lpips.LPIPS state dict or merge torchvision "
                "alexnet features into the file"
            )
        out[f"conv{i}.weight"] = sd[key]
        out[f"conv{i}.bias"] = sd[key.replace("weight", "bias")]
    for i in range(5):
        cands = [f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"]
        key = next((c for c in cands if c in sd), None)
        if key is None:
            raise KeyError(f"LPIPS: missing linear head under any of {cands}")
        out[f"lin{i}.weight"] = sd[key]
    return out


def load_lpips_weights(path: str) -> None:
    """Load AlexNet conv weights + LPIPS linear heads from a torch .pth
    (full lpips.LPIPS(net='alex') state dict, or the lin-only official file
    merged with torchvision alexnet weights). Fails loudly on unknown layout."""
    global _LPIPS_WEIGHTS
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    w = {k: np.asarray(v.detach().numpy(), np.float32) for k, v in sd.items()}
    _LPIPS_WEIGHTS = _resolve_lpips_arrays(w)


def lpips_available() -> bool:
    return _LPIPS_WEIGHTS is not None


def lpips(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance; a, b (..., H, W, 3) in [-1, 1]. Requires
    load_lpips_weights() first."""
    if _LPIPS_WEIGHTS is None:
        raise RuntimeError("LPIPS weights not loaded; call load_lpips_weights(path)")
    w = _LPIPS_WEIGHTS

    def normalize(x):
        return (x - _SHIFT) / _SCALE

    def alex_feats(x):
        h = normalize(x.astype(jnp.float32))
        feats = []
        for i, (_, kk, s, p) in enumerate(_ALEX_LAYOUT):
            kern = jnp.asarray(np.transpose(w[f"conv{i}.weight"], (2, 3, 1, 0)))
            bias = jnp.asarray(w[f"conv{i}.bias"])
            h = jax.lax.conv_general_dilated(
                h, kern, (s, s), [(p, p), (p, p)], dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + bias
            h = jax.nn.relu(h)
            feats.append(h)
            if i in _POOL_AFTER:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
                )
        return feats

    fa = alex_feats(a)
    fb = alex_feats(b)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        xn = x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-10)
        yn = y / jnp.clip(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-10)
        diff = (xn - yn) ** 2
        lin = jnp.asarray(w[f"lin{i}.weight"][:, :, 0, 0].T)  # (C, 1)
        total = total + jnp.mean(diff @ lin, axis=(-3, -2, -1))
    return total


def video_metrics(pred: np.ndarray, gt: np.ndarray) -> Dict[str, Optional[float]]:
    """Per-video means; pred/gt (T, H, W, 3) in [0, 1] (or [-1, 1] for lpips).

    `lpips` is ALWAYS present in the result: a float when weights are loaded,
    None when skipped — so an eval run can never silently measure less than
    it claims."""
    out: Dict[str, Optional[float]] = {
        "psnr": float(jnp.mean(psnr(jnp.asarray(pred), jnp.asarray(gt)))),
        "ssim": float(jnp.mean(ssim(jnp.asarray(pred), jnp.asarray(gt)))),
    }
    if lpips_available():
        out["lpips"] = float(
            jnp.mean(lpips(jnp.asarray(pred) * 2 - 1, jnp.asarray(gt) * 2 - 1))
        )
    else:
        out["lpips"] = None
    return out
