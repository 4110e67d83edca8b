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


class GEGLU(nn.Module):
    """x, gate = proj(x).split(2); x * gelu(gate)  (cf. lvdm/modules/attention.py:415-422)."""

    dim_out: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact erf GELU: the reference uses torch.nn.functional.gelu default
        return h * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(h.dtype)


class FeedForward(nn.Module):
    """Transformer MLP with GEGLU gating (cf. attention.py:425-442)."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        h = GEGLU(inner, dtype=self.dtype, name="geglu")(x)
        return Dense(self.dim, dtype=self.dtype, name="out")(h)


def silu(x):
    # SiLU with fp32 sigmoid for parity with torch.nn.SiLU under autocast
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def nearest_upsample_2x(x):
    """Nearest-neighbor 2x spatial upsample for (..., H, W, C)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=-3), 2, axis=-2)
