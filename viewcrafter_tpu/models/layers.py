"""Shared NN primitives, channels-last and TPU-typed.

Mixed-precision policy (mirrors the reference's effective autocast behavior,
lvdm/basics.py:76-87 GroupNorm32 + torch.cuda.amp): matmuls/convs run in the
module `dtype` (bf16 on TPU), normalizations and softmax run in float32,
parameters are stored float32.

All tensors are channels-last: images (B, H, W, C), videos (B, T, H, W, C),
tokens (B, S, C) — the layouts XLA tiles best on TPU.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

zeros_init = nn.initializers.zeros


class _GNParams(nn.Module):
    """Parameter holder named to preserve the flax-GroupNorm checkpoint layout
    (<parent>/GroupNorm_0/{scale,bias})."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm computed in float32 regardless of input dtype, with an
    optional fused SiLU epilogue.

    Matches torch.nn.GroupNorm semantics (per reference lvdm/basics.py:76-87:
    GroupNorm32 upcasts to fp32; SD-VAE uses eps=1e-6, UNet normalization uses
    eps=1e-5 which is torch's default). On TPU, blocks that fit VMEM run as a
    single fused Pallas kernel (ops/pallas/groupnorm.py) — the un-fused fp32
    chain costs ~12% of a flagship UNet eval.
    """

    num_groups: int = 32
    eps: float = 1e-5
    out_dtype: Optional[Dtype] = None
    with_silu: bool = False

    @nn.compact
    def __call__(self, x):
        from viewcrafter_tpu.ops.pallas.groupnorm import group_norm_silu

        scale, bias = _GNParams(x.shape[-1], name="GroupNorm_0")()
        y = group_norm_silu(
            x, scale, bias, num_groups=self.num_groups, eps=self.eps, with_silu=self.with_silu
        )
        return y.astype(self.out_dtype or x.dtype)


class LayerNormF32(nn.Module):
    """LayerNorm in float32 (torch default eps=1e-5), output cast back."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return y.astype(x.dtype)


class _ScaleBias(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class LNParams(nn.Module):
    """LayerNormF32-compatible parameter holder
    (<name>/LayerNorm_0/{scale,bias}) for layers that fuse the norm into a
    Pallas kernel; checkpoints stay interchangeable with LayerNormF32."""

    features: int

    @nn.compact
    def __call__(self):
        return _ScaleBias(self.features, name="LayerNorm_0")()


class DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact layout (<name>/{kernel,bias})
    so fused kernels can consume the raw weights while checkpoints stay
    interchangeable with the Dense-module path."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


def layer_norm_f32(x, scale, bias, eps=1e-5):
    """Two-pass f32 LayerNorm matching LayerNormF32 semantics."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return ((xc * jax.lax.rsqrt(var + eps)) * scale + bias).astype(x.dtype)


def Dense(features: int, *, use_bias: bool = True, dtype=jnp.bfloat16, zero_init: bool = False, name=None):
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=zeros_init if zero_init else nn.initializers.lecun_normal(),
        bias_init=zeros_init,
        name=name,
    )


def Conv(
    features: int,
    kernel: Sequence[int],
    *,
    strides: Sequence[int] | int = 1,
    padding="SAME",
    dtype=jnp.bfloat16,
    zero_init: bool = False,
    name=None,
):
    return nn.Conv(
        features,
        kernel_size=tuple(kernel),
        strides=strides,
        padding=padding,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=zeros_init if zero_init else nn.initializers.lecun_normal(),
        bias_init=zeros_init,
        name=name,
    )


class _GEGLUParams(nn.Module):
    """GEGLU-compatible parameter holder (<name>/proj/{kernel,bias})."""

    in_features: int
    inner: int

    @nn.compact
    def __call__(self):
        return DenseParams(self.in_features, self.inner * 2, name="proj")()


class FeedForward(nn.Module):
    """Transformer MLP with GEGLU gating (cf. attention.py:425-442).

    `ln`: optional (scale, bias) of the preceding LayerNorm; when given, the
    norm is applied inside so that on TPU the whole branch (LayerNorm +
    GEGLU + out projection) runs as ONE Pallas kernel
    (ops/pallas/ff_layer.py) — the unfused chain materializes the
    8x-activation-size GEGLU intermediate in HBM.

    `impl`: "xla" disables the fused kernel (programmatic twin of the
    VIEWCRAFTER_ATTN_IMPL env var, which still takes precedence)."""

    dim: int
    mult: int = 4
    impl: str = "auto"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, ln=None):
        import os

        from viewcrafter_tpu.ops.attention import _on_tpu
        from viewcrafter_tpu.ops.pallas.ff_layer import (
            fused_ff_layer, supports_fused_ff,
        )

        inner = int(self.dim * self.mult)
        w1, b1 = _GEGLUParams(self.dim, inner, name="geglu")()
        w2, b2 = DenseParams(inner, self.dim, name="out")()

        from viewcrafter_tpu.parallel import tp as _tp

        fuse = (
            ln is not None
            and os.environ.get("VIEWCRAFTER_ATTN_IMPL", self.impl) != "xla"
            and _on_tpu()
            and _tp.active_mesh() is None  # pallas is opaque to the partitioner
            and supports_fused_ff(x.shape, self.dim, inner, itemsize=x.dtype.itemsize)
        )
        if fuse:
            return fused_ff_layer(x, ln[0], ln[1], w1, b1, w2, b2)

        if ln is not None:
            x = layer_norm_f32(x, ln[0], ln[1])
        xc = x.astype(self.dtype)
        y = xc @ w1.astype(self.dtype) + b1.astype(self.dtype)
        # GEGLU split order + exact erf GELU per the reference's
        # torch.nn.functional.gelu default (attention.py:415-422)
        h, gate = jnp.split(y, 2, axis=-1)
        g = h * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(h.dtype)
        # tensor parallelism: gated hidden over "tp" (the out projection
        # contracts it -> one psum); constrained AFTER the GEGLU split so the
        # h|gate halves shard independently. No-op without an active tp mesh.
        if g.ndim == 3:  # spatial layout (B*T, S, hidden)
            g = _tp.constrain(g, ("dp", "sp"), None, "tp")
        elif g.ndim == 4:  # temporal layout (B, T, S, hidden)
            g = _tp.constrain(g, "dp", None, "sp", "tp")
        return g @ w2.astype(self.dtype) + b2.astype(self.dtype)


def silu(x):
    # SiLU with fp32 sigmoid for parity with torch.nn.SiLU under autocast
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def nearest_upsample_2x(x):
    """Nearest-neighbor 2x spatial upsample for (..., H, W, C)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=-3), 2, axis=-2)
