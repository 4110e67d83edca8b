"""KL-regularized image autoencoder (SD-style f8 VAE), channels-last.

Architecture parity with the reference first stage:
  - Encoder/Decoder resnet stacks + mid attention: lvdm/modules/networks/ae_modules.py:213-360,365-580
  - AutoencoderKL quant convs + encode/decode: lvdm/models/autoencoder.py:97-107
  - DiagonalGaussianDistribution: lvdm/distributions.py:24-65
Config (configs/inference_pvd_1024.yaml:66-87): ch=128, ch_mult=[1,2,4,4],
num_res_blocks=2, z=4 channels, double_z, no encoder attn resolutions.

TPU-first notes: all tensors NHWC; GroupNorm eps=1e-6 in fp32; convs bf16.
The video pipeline maps this per frame under `lax.scan`/`vmap` (the reference's
`perframe_ae` loop, ddpm3d.py:633-639) so peak HBM stays ~1 frame of encoder
activations.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from viewcrafter_tpu.models.layers import Conv, GroupNorm32, silu
from viewcrafter_tpu.ops.attention import attention

Dtype = Any


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(32, eps=1e-6, with_silu=True, name="norm1")(x)
        h = Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(32, eps=1e-6, with_silu=True, name="norm2")(h)
        h = Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = Conv(self.out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over the spatial grid (ae_modules.py:26-79)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = GroupNorm32(32, eps=1e-6, name="norm")(x)
        q = Conv(c, (1, 1), dtype=self.dtype, name="q")(y).reshape(b, h * w, 1, c)
        k = Conv(c, (1, 1), dtype=self.dtype, name="k")(y).reshape(b, h * w, 1, c)
        v = Conv(c, (1, 1), dtype=self.dtype, name="v")(y).reshape(b, h * w, 1, c)
        o = attention(q, k, v).reshape(b, h, w, c)
        o = Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(o)
        return x + o


class Downsample(nn.Module):
    """Asymmetric-pad stride-2 conv, mirroring torch F.pad(x,(0,1,0,1)) + valid
    conv (ae_modules.py:91-108)."""

    ch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return Conv(self.ch, (3, 3), strides=2, padding="VALID", dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    ch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return Conv(self.ch, (3, 3), dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [-1, 1] -> moments (B, H/8, W/8, 2*z)."""
        h = Conv(self.ch, (3, 3), dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * mult, dtype=self.dtype, name=f"down_{i}_block_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = Downsample(h.shape[-1], dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm32(32, eps=1e-6, with_silu=True, name="norm_out")(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return Conv(out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z):
        """z: (B, h, w, z_channels) -> (B, 8h, 8w, 3)."""
        block_in = self.ch * self.ch_mult[-1]
        h = Conv(block_in, (3, 3), dtype=self.dtype, name="conv_in")(z.astype(self.dtype))
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for i in reversed(range(len(self.ch_mult))):
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock(self.ch * self.ch_mult[i], dtype=self.dtype, name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = Upsample(h.shape[-1], dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm32(32, eps=1e-6, with_silu=True, name="norm_out")(h)
        return Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """Encoder/Decoder + 1x1 quant convs (lvdm/models/autoencoder.py:13-107)."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    embed_dim: int = 4
    z_channels: int = 4
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            z_channels=self.z_channels, dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks, dtype=self.dtype,
        )
        self.quant_conv = Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = Conv(self.z_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")

    def encode_moments(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (mean, logvar), logvar clamped to [-30, 20] (lvdm/distributions.py:30-33)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng=None):
        """Posterior sample if rng given (the reference samples at inference:
        ddpm3d.py:612-618 get_first_stage_encoding), else the mode."""
        mean, logvar = self.encode_moments(x)
        if rng is None:
            return mean
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z.astype(self.dtype)))

    def __call__(self, x, rng=None):
        z = self.encode(x, rng)
        return self.decode(z)
