"""Image resize helpers.

`resize_bilinear_align_corners` reproduces torch's
F.interpolate(mode='bilinear', align_corners=True) exactly (the DPT fusion
blocks and head use it: extern/dust3r/croco/models/dpt_block.py:137-139,321) —
jax.image.resize uses half-pixel sampling, which differs.
"""

from __future__ import annotations

import jax.numpy as jnp


def _axis_coords(n_in: int, n_out: int) -> jnp.ndarray:
    if n_out == 1 or n_in == 1:
        return jnp.zeros((n_out,), jnp.float32)
    return jnp.linspace(0.0, float(n_in - 1), n_out)


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """x: (..., H, W, C) -> (..., out_h, out_w, C), align_corners=True."""
    h, w = x.shape[-3], x.shape[-2]
    yy = _axis_coords(h, out_h)
    xx = _axis_coords(w, out_w)
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (yy - y0)[:, None, None]
    wx = (xx - x0)[None, :, None]

    def gather(yi, xi):
        return x[..., yi, :, :][..., :, xi, :]

    top = gather(y0, x0) * (1 - wx) + gather(y0, x1) * wx
    bot = gather(y1, x0) * (1 - wx) + gather(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Half-pixel bilinear (torch align_corners=False / jax.image default),
    used for the render -> diffusion-resolution upsample (viewcrafter.py:158)."""
    import jax

    out_shape = x.shape[:-3] + (out_h, out_w, x.shape[-1])
    return jax.image.resize(x, out_shape, method="bilinear")
