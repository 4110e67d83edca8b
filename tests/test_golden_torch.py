"""Golden activation-parity tests against the reference torch modules.

Each test instantiates the reference implementation on CPU with seeded random
weights, pushes its state dict through our checkpoint translator
(viewcrafter_tpu/utils/checkpoint.py), runs the SAME input through both, and
asserts value-level parity. This verifies every piece of wiring the
shape-coverage tests cannot: GEGLU split order, temporal reshapes, per-frame
context splits, RoPE pairing, DPT crops, attention scaling, norm placement.

Reference modules exercised (imported from /root/reference, never copied):
  - UNetModel            lvdm/modules/networks/openaimodel3d.py:548
  - Encoder/Decoder      lvdm/modules/networks/ae_modules.py:364,466
  - Resampler            lvdm/modules/encoders/resampler.py:96
  - AsymmetricCroCo3DStereo  extern/dust3r/dust3r/model.py:25
The CLIP towers cannot be instantiated (open_clip is not installed), so the
oracle there is a hand-built torch module with open_clip's exact architecture
and state-dict key layout (condition.py:174-234,295-372 document the usage).
"""

from __future__ import annotations

import os
import sys
from collections import OrderedDict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "lvdm")), reason="reference tree absent"
)

for _p in (REF, f"{REF}/extern/dust3r", f"{REF}/extern/dust3r/croco"):
    if os.path.isdir(_p) and _p not in sys.path:
        sys.path.append(_p)

torch.set_num_threads(max(1, (os.cpu_count() or 2) - 1))


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def randomize_(module: "torch.nn.Module", seed: int) -> None:
    """Replace every float param/buffer with seeded, fan-in-scaled noise.

    The reference zero-inits several layers (fps_embedding tail, out conv,
    ip-adapter branches); random weights make the parity check sensitive to
    ALL wiring, not just the non-zero subset. Fan-in scaling keeps deep
    activations O(1) (unscaled noise overflows expm1 in the DUSt3R head).
    """
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        sd = module.state_dict()
        for k, v in sd.items():
            if not v.is_floating_point():
                continue
            fan_in = 1
            for dim in v.shape[1:]:
                fan_in *= dim
            scale = 0.2 if v.ndim <= 1 else fan_in ** -0.5
            v.copy_(torch.randn(v.shape, generator=g, dtype=torch.float32) * scale)


def assert_close(ours, ref, tol: float = 2e-3, name: str = ""):
    a = np.asarray(ours, np.float32)
    b = np.asarray(ref, np.float32)
    assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
    scale = max(1.0, float(np.abs(b).max()))
    diff = float(np.abs(a - b).max())
    assert diff <= tol * scale, f"{name}: max|delta|={diff:.3e} (scale {scale:.3e})"


def _assert_translated_matches_init(translated, init_tree, name):
    from viewcrafter_tpu.utils.checkpoint import verify_tree_shapes

    errs = verify_tree_shapes(translated, init_tree)
    assert not errs, f"{name}: translator/model tree mismatch: {errs[:8]}"


# ---------------------------------------------------------------------------
# UNet3D vs lvdm UNetModel
# ---------------------------------------------------------------------------


def test_unet_golden():
    from lvdm.modules.networks.openaimodel3d import UNetModel

    from viewcrafter_tpu.config import UNetConfig
    from viewcrafter_tpu.models.unet3d import UNet3D
    from viewcrafter_tpu.utils.checkpoint import Translator, map_unet

    T, H, W = 4, 16, 16
    ref = UNetModel(
        in_channels=8, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1, 2], dropout=0.0, channel_mult=[1, 2],
        context_dim=64, num_head_channels=16, transformer_depth=1,
        use_linear=True, use_checkpoint=False, temporal_conv=True,
        temporal_attention=True, temporal_selfatt_only=True,
        use_relative_position=False, use_causal_attention=False,
        temporal_length=T, addition_attention=True, image_cross_attention=True,
        default_fs=10, fs_condition=True,
    ).eval()
    randomize_(ref, 0)

    cfg = UNetConfig(
        model_channels=32, num_res_blocks=1, attention_resolutions=(1, 2),
        channel_mult=(1, 2), num_head_channels=16, context_dim=64,
        temporal_length=T,
    )
    sd = {f"model.diffusion_model.{k}": v for k, v in ref.state_dict().items()}
    t = Translator(sd)
    map_unet(t, cfg=cfg)
    params = {"params": t.nested()}

    model = UNet3D(cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, T, H, W), np.float32)
    ctx = rng.standard_normal((1, 77 + T * 16, 64), np.float32)
    ts = np.array([333], np.int64)
    fs = np.array([7], np.int64)

    init_tree = model.init(
        jax.random.PRNGKey(0), jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1)),
        jnp.asarray(ts), jnp.asarray(ctx), fs=jnp.asarray(fs, jnp.float32),
    )
    _assert_translated_matches_init(params, init_tree, "unet")

    with torch.no_grad():
        y_ref = ref(
            torch.from_numpy(x), torch.from_numpy(ts),
            context=torch.from_numpy(ctx), fs=torch.from_numpy(fs),
        ).numpy()

    y = model.apply(
        params, jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1)),
        jnp.asarray(ts), jnp.asarray(ctx), fs=jnp.asarray(fs, jnp.float32),
    )
    assert_close(np.transpose(np.asarray(y), (0, 4, 1, 2, 3)), y_ref, name="unet")


def test_unet_relative_position_golden():
    """use_relative_position=True variant (attention.py:20-39,104-123): the
    Shaw-style temporal rel-pos tables bias logits (q·k2) and outputs
    (probs·v2). Off in shipped configs; config-parity coverage."""
    from lvdm.modules.networks.openaimodel3d import UNetModel

    from viewcrafter_tpu.config import UNetConfig
    from viewcrafter_tpu.models.unet3d import UNet3D
    from viewcrafter_tpu.utils.checkpoint import Translator, map_unet

    T, H, W = 4, 16, 16
    ref = UNetModel(
        in_channels=8, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1, 2], dropout=0.0, channel_mult=[1, 2],
        context_dim=64, num_head_channels=16, transformer_depth=1,
        use_linear=True, use_checkpoint=False, temporal_conv=True,
        temporal_attention=True, temporal_selfatt_only=True,
        use_relative_position=True, use_causal_attention=False,
        temporal_length=T, addition_attention=True, image_cross_attention=True,
        default_fs=10, fs_condition=True,
    ).eval()
    randomize_(ref, 5)

    cfg = UNetConfig(
        model_channels=32, num_res_blocks=1, attention_resolutions=(1, 2),
        channel_mult=(1, 2), num_head_channels=16, context_dim=64,
        temporal_length=T, use_relative_position=True,
    )
    sd = {f"model.diffusion_model.{k}": v for k, v in ref.state_dict().items()}
    t = Translator(sd)
    map_unet(t, cfg=cfg)
    params = {"params": t.nested()}

    model = UNet3D(cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 8, T, H, W), np.float32)
    ctx = rng.standard_normal((1, 77 + T * 16, 64), np.float32)
    ts = np.array([123], np.int64)
    fs = np.array([7], np.int64)

    init_tree = model.init(
        jax.random.PRNGKey(0), jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1)),
        jnp.asarray(ts), jnp.asarray(ctx), fs=jnp.asarray(fs, jnp.float32),
    )
    _assert_translated_matches_init(params, init_tree, "unet_relpos")

    with torch.no_grad():
        y_ref = ref(
            torch.from_numpy(x), torch.from_numpy(ts),
            context=torch.from_numpy(ctx), fs=torch.from_numpy(fs),
        ).numpy()

    y = model.apply(
        params, jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1)),
        jnp.asarray(ts), jnp.asarray(ctx), fs=jnp.asarray(fs, jnp.float32),
    )
    assert_close(np.transpose(np.asarray(y), (0, 4, 1, 2, 3)), y_ref, name="unet_relpos")


# ---------------------------------------------------------------------------
# VAE vs lvdm ae_modules Encoder/Decoder (+ quant convs)
# ---------------------------------------------------------------------------


def test_vae_golden():
    from lvdm.modules.networks.ae_modules import Decoder as RefDecoder
    from lvdm.modules.networks.ae_modules import Encoder as RefEncoder

    from viewcrafter_tpu.config import VAEConfig
    from viewcrafter_tpu.models.vae import AutoencoderKL
    from viewcrafter_tpu.utils.checkpoint import Translator, map_vae

    dd = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=[], in_channels=3, resolution=32, z_channels=4)
    enc = RefEncoder(double_z=True, **dd).eval()
    dec = RefDecoder(**dd).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    for i, m in enumerate([enc, dec, quant, post_quant]):
        randomize_(m, 10 + i)

    sd = {}
    for prefix, m in [("encoder", enc), ("decoder", dec),
                      ("quant_conv", quant), ("post_quant_conv", post_quant)]:
        for k, v in m.state_dict().items():
            key = f"first_stage_model.{prefix}.{k}" if prefix.endswith("r") else f"first_stage_model.{prefix}.{k}"
            sd[key] = v

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, embed_dim=4, z_channels=4)
    t = Translator(sd)
    map_vae(t, cfg=cfg)
    params = {"params": t.nested()}

    model = AutoencoderKL(ch=cfg.ch, ch_mult=cfg.ch_mult, num_res_blocks=cfg.num_res_blocks,
                          embed_dim=cfg.embed_dim, z_channels=cfg.z_channels, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 32, 32), np.float32)
    z = rng.standard_normal((2, 4, 16, 16), np.float32) * 0.5

    init_tree = model.init(jax.random.PRNGKey(0), jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    _assert_translated_matches_init(params, init_tree, "vae")

    with torch.no_grad():
        moments_ref = quant(enc(torch.from_numpy(x)))
        mean_ref = moments_ref[:, :4].numpy()
        logvar_ref = torch.clamp(moments_ref[:, 4:], -30.0, 20.0).numpy()
        dec_ref = dec(post_quant(torch.from_numpy(z))).numpy()

    mean, logvar = model.apply(
        params, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), method=AutoencoderKL.encode_moments
    )
    assert_close(np.transpose(np.asarray(mean), (0, 3, 1, 2)), mean_ref, name="vae encode mean")
    assert_close(np.transpose(np.asarray(logvar), (0, 3, 1, 2)), logvar_ref, name="vae encode logvar")

    out = model.apply(params, jnp.transpose(jnp.asarray(z), (0, 2, 3, 1)), method=AutoencoderKL.decode)
    assert_close(np.transpose(np.asarray(out), (0, 3, 1, 2)), dec_ref, name="vae decode")


# ---------------------------------------------------------------------------
# Resampler vs lvdm Resampler
# ---------------------------------------------------------------------------


def test_resampler_golden():
    from lvdm.modules.encoders.resampler import Resampler as RefResampler

    from viewcrafter_tpu.config import ResamplerConfig
    from viewcrafter_tpu.models.resampler import Resampler
    from viewcrafter_tpu.utils.checkpoint import Translator, map_resampler

    kw = dict(dim=64, depth=2, dim_head=16, heads=4, num_queries=4,
              embedding_dim=48, output_dim=64, ff_mult=4, video_length=4)
    ref = RefResampler(**kw).eval()
    randomize_(ref, 20)

    sd = {f"image_proj_model.{k}": v for k, v in ref.state_dict().items()}
    t = Translator(sd)
    map_resampler(t, depth=2)
    params = {"params": t.nested()}

    cfg = ResamplerConfig(**kw)
    model = Resampler(cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 32, 48), np.float32)

    init_tree = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _assert_translated_matches_init(params, init_tree, "resampler")

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()
    y = model.apply(params, jnp.asarray(x))
    assert_close(np.asarray(y), y_ref, name="resampler")


# ---------------------------------------------------------------------------
# DUSt3R vs AsymmetricCroCo3DStereo (full two-view network incl. DPT heads)
# ---------------------------------------------------------------------------


def test_dust3r_golden():
    from dust3r.model import AsymmetricCroCo3DStereo

    from viewcrafter_tpu.config import Dust3rConfig
    from viewcrafter_tpu.models.dust3r import Dust3rModel
    from viewcrafter_tpu.utils.checkpoint import translate_dust3r_checkpoint

    H = W = 64
    inf = float("inf")
    ref = AsymmetricCroCo3DStereo(
        output_mode="pts3d", head_type="dpt",
        depth_mode=("exp", -inf, inf), conf_mode=("exp", 1, inf),
        landscape_only=True, patch_embed_cls="PatchEmbedDust3R",
        img_size=(H, W), patch_size=16,
        enc_embed_dim=64, enc_depth=4, enc_num_heads=2,
        dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
        mlp_ratio=4, pos_embed="RoPE100",
    ).eval()
    randomize_(ref, 30)

    cfg = Dust3rConfig(
        img_size=(H, W), patch_size=16,
        enc_embed_dim=64, enc_depth=4, enc_num_heads=2,
        dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
    )
    params = translate_dust3r_checkpoint(ref.state_dict(), cfg=cfg)

    model = Dust3rModel(cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    img1 = rng.standard_normal((1, 3, H, W), np.float32) * 0.5
    img2 = rng.standard_normal((1, 3, H, W), np.float32) * 0.5

    j1 = jnp.transpose(jnp.asarray(img1), (0, 2, 3, 1))
    j2 = jnp.transpose(jnp.asarray(img2), (0, 2, 3, 1))
    init_tree = model.init(jax.random.PRNGKey(0), j1, j2)
    _assert_translated_matches_init(params, init_tree, "dust3r")

    true_shape = torch.tensor([[H, W]], dtype=torch.int32)
    with torch.no_grad():
        res1, res2 = ref(
            {"img": torch.from_numpy(img1), "true_shape": true_shape, "instance": ["0"]},
            {"img": torch.from_numpy(img2), "true_shape": true_shape, "instance": ["1"]},
        )

    out = model.apply(params, j1, j2)
    assert_close(np.asarray(out["pts3d1"]), res1["pts3d"].numpy(), name="dust3r pts3d1")
    assert_close(np.asarray(out["conf1"]), res1["conf"].numpy(), name="dust3r conf1")
    assert_close(
        np.asarray(out["pts3d2_in_view1"]), res2["pts3d_in_other_view"].numpy(),
        name="dust3r pts3d2",
    )
    assert_close(np.asarray(out["conf2"]), res2["conf"].numpy(), name="dust3r conf2")


def test_dust3r_manyar_golden():
    """ManyAR portrait support vs the reference ManyAR_PatchEmbed +
    transpose_to_landscape pipeline (dust3r/patch_embed.py:32-70,
    dust3r/utils/misc.py:54-97): a mixed batch where view1 = [landscape,
    portrait] and view2 = [portrait, landscape], portrait images stored
    transposed-to-landscape with true_shape recording the real orientation."""
    from dust3r.model import AsymmetricCroCo3DStereo

    from viewcrafter_tpu.config import Dust3rConfig
    from viewcrafter_tpu.models.dust3r import Dust3rModel
    from viewcrafter_tpu.utils.checkpoint import translate_dust3r_checkpoint

    H, W = 32, 64
    inf = float("inf")
    ref = AsymmetricCroCo3DStereo(
        output_mode="pts3d", head_type="dpt",
        depth_mode=("exp", -inf, inf), conf_mode=("exp", 1, inf),
        landscape_only=True, patch_embed_cls="ManyAR_PatchEmbed",
        img_size=(H, W), patch_size=16,
        enc_embed_dim=64, enc_depth=4, enc_num_heads=2,
        dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
        mlp_ratio=4, pos_embed="RoPE100",
    ).eval()
    randomize_(ref, 31)

    cfg = Dust3rConfig(
        img_size=(H, W), patch_size=16,
        enc_embed_dim=64, enc_depth=4, enc_num_heads=2,
        dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
    )
    params = translate_dust3r_checkpoint(ref.state_dict(), cfg=cfg)
    model = Dust3rModel(cfg=cfg, dtype=jnp.float32)

    rng = np.random.default_rng(7)
    img1 = rng.standard_normal((2, 3, H, W), np.float32) * 0.5
    img2 = rng.standard_normal((2, 3, H, W), np.float32) * 0.5
    # per-image true shapes: (h, w); h > w marks portrait (stored transposed)
    ts1 = torch.tensor([[H, W], [W, H]], dtype=torch.int32)
    ts2 = torch.tensor([[W, H], [H, W]], dtype=torch.int32)
    with torch.no_grad():
        res1, res2 = ref(
            {"img": torch.from_numpy(img1), "true_shape": ts1, "instance": ["0", "1"]},
            {"img": torch.from_numpy(img2), "true_shape": ts2, "instance": ["2", "3"]},
        )

    j1 = jnp.transpose(jnp.asarray(img1), (0, 2, 3, 1))
    j2 = jnp.transpose(jnp.asarray(img2), (0, 2, 3, 1))
    out = model.apply(
        params, j1, j2,
        is_portrait1=jnp.array([False, True]),
        is_portrait2=jnp.array([True, False]),
    )
    assert_close(np.asarray(out["pts3d1"]), res1["pts3d"].numpy(), name="manyar pts3d1")
    assert_close(np.asarray(out["conf1"]), res1["conf"].numpy(), name="manyar conf1")
    assert_close(
        np.asarray(out["pts3d2_in_view1"]), res2["pts3d_in_other_view"].numpy(),
        name="manyar pts3d2",
    )
    assert_close(np.asarray(out["conf2"]), res2["conf"].numpy(), name="manyar conf2")

    # all-portrait static fast path == per-image array path
    out_static = model.apply(params, j1, j2, is_portrait1=True, is_portrait2=True)
    out_array = model.apply(
        params, j1, j2,
        is_portrait1=jnp.array([True, True]), is_portrait2=jnp.array([True, True]),
    )
    assert_close(
        np.asarray(out_static["pts3d1"]), np.asarray(out_array["pts3d1"]),
        tol=1e-6, name="manyar static-vs-array",
    )


# ---------------------------------------------------------------------------
# CLIP towers vs a hand-built torch oracle with open_clip's architecture
# ---------------------------------------------------------------------------


class _TorchCLIPBlock(torch.nn.Module):
    """open_clip ResidualAttentionBlock: pre-LN MHA + pre-LN GELU MLP, with
    open_clip's state-dict key layout (attn.in_proj_weight etc.)."""

    def __init__(self, width, heads):
        super().__init__()
        self.ln_1 = torch.nn.LayerNorm(width)
        self.attn = torch.nn.MultiheadAttention(width, heads)
        self.ln_2 = torch.nn.LayerNorm(width)
        self.mlp = torch.nn.Sequential(OrderedDict([
            ("c_fc", torch.nn.Linear(width, width * 4)),
            ("gelu", torch.nn.GELU()),
            ("c_proj", torch.nn.Linear(width * 4, width)),
        ]))

    def forward(self, x, attn_mask=None):  # x: (S, B, C)
        y = self.ln_1(x)
        y = self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
        x = x + y
        return x + self.mlp(self.ln_2(x))


class _TorchCLIPText(torch.nn.Module):
    def __init__(self, vocab, width, heads, layers, ctx_len):
        super().__init__()
        self.token_embedding = torch.nn.Embedding(vocab, width)
        self.positional_embedding = torch.nn.Parameter(torch.zeros(ctx_len, width))
        self.transformer = torch.nn.Module()
        self.transformer.resblocks = torch.nn.ModuleList(
            [_TorchCLIPBlock(width, heads) for _ in range(layers)]
        )
        self.ln_final = torch.nn.LayerNorm(width)
        mask = torch.full((ctx_len, ctx_len), float("-inf")).triu(1)
        self.register_buffer("mask", mask, persistent=False)

    def forward(self, tokens):
        """Penultimate-layer protocol (condition.py:214-234): run all blocks
        except the last, then ln_final; no pooling/projection."""
        x = self.token_embedding(tokens) + self.positional_embedding
        x = x.permute(1, 0, 2)
        for block in list(self.transformer.resblocks)[:-1]:
            x = block(x, attn_mask=self.mask)
        return self.ln_final(x.permute(1, 0, 2))


class _TorchCLIPVision(torch.nn.Module):
    def __init__(self, image_size, patch_size, width, heads, layers):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, width, patch_size, patch_size, bias=False)
        self.class_embedding = torch.nn.Parameter(torch.zeros(width))
        grid = image_size // patch_size
        self.positional_embedding = torch.nn.Parameter(torch.zeros(grid * grid + 1, width))
        self.ln_pre = torch.nn.LayerNorm(width)
        self.transformer = torch.nn.Module()
        self.transformer.resblocks = torch.nn.ModuleList(
            [_TorchCLIPBlock(width, heads) for _ in range(layers)]
        )

    def forward(self, x):
        """All pre-pool tokens, no ln_post (condition.py:356-372)."""
        x = self.conv1(x)
        x = x.flatten(2).transpose(1, 2)  # (B, S, C)
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x).permute(1, 0, 2)
        for block in self.transformer.resblocks:
            x = block(x)
        return x.permute(1, 0, 2)


def test_clip_text_golden():
    from viewcrafter_tpu.config import CLIPTextConfig
    from viewcrafter_tpu.models.clip import CLIPTextEncoder
    from viewcrafter_tpu.utils.checkpoint import Translator, map_clip_text

    cfg = CLIPTextConfig(vocab_size=101, width=32, heads=2, layers=3, context_length=16)
    ref = _TorchCLIPText(cfg.vocab_size, cfg.width, cfg.heads, cfg.layers, cfg.context_length).eval()
    randomize_(ref, 40)

    sd = {f"cond_stage_model.model.{k}": v for k, v in ref.state_dict().items()}
    t = Translator(sd)
    map_clip_text(t, layers=cfg.layers)
    params = {"params": t.nested()}

    model = CLIPTextEncoder(cfg=cfg, dtype=jnp.float32)
    tokens = np.array([[1, 5, 9, 2] + [0] * 12, [3, 7, 7, 7] + [0] * 12], np.int32)

    init_tree = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
    _assert_translated_matches_init(params, init_tree, "clip_text")

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(tokens).long()).numpy()
    y = model.apply(params, jnp.asarray(tokens))
    assert_close(np.asarray(y), y_ref, name="clip_text")


def test_croco_pretrain_golden():
    """CroCoPretrain vs the reference CroCoNet masked forward (a fixed mask is
    injected into both so the pretext task is deterministic)."""
    from models.croco import CroCoNet

    from viewcrafter_tpu.models.croco_pretrain import (
        CroCoPretrain, CroCoPretrainConfig, masked_mse_loss,
    )
    from viewcrafter_tpu.utils.checkpoint import Translator, map_croco_pretrain

    H = W = 64
    cfg = CroCoPretrainConfig(
        img_size=(H, W), patch_size=16, enc_embed_dim=64, enc_depth=2,
        enc_num_heads=2, dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
        mask_ratio=0.75,
    )
    ref = CroCoNet(
        img_size=H, patch_size=16, mask_ratio=cfg.mask_ratio,
        enc_embed_dim=cfg.enc_embed_dim, enc_depth=cfg.enc_depth,
        enc_num_heads=cfg.enc_num_heads, dec_embed_dim=cfg.dec_embed_dim,
        dec_depth=cfg.dec_depth, dec_num_heads=cfg.dec_num_heads,
        pos_embed="RoPE100",
    ).eval()
    randomize_(ref, 70)

    n = (H // 16) * (W // 16)
    num_mask = int(cfg.mask_ratio * n)
    rngm = np.random.default_rng(9)
    mask = np.zeros((1, n), bool)
    mask[0, rngm.permutation(n)[:num_mask]] = True
    class _FixedMask(torch.nn.Module):
        def forward(self, x):
            return torch.from_numpy(mask)

    ref.mask_generator = _FixedMask()

    t = Translator(dict(ref.state_dict()))
    map_croco_pretrain(t, cfg.enc_depth, cfg.dec_depth)
    params = {"params": t.nested()}

    model = CroCoPretrain(cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(10)
    img1 = rng.standard_normal((1, 3, H, W)).astype(np.float32) * 0.5
    img2 = rng.standard_normal((1, 3, H, W)).astype(np.float32) * 0.5
    j1 = jnp.transpose(jnp.asarray(img1), (0, 2, 3, 1))
    j2 = jnp.transpose(jnp.asarray(img2), (0, 2, 3, 1))

    init_tree = model.init(jax.random.PRNGKey(0), j1, j2, mask=jnp.asarray(mask))
    _assert_translated_matches_init(params, init_tree, "croco_pretrain")

    with torch.no_grad():
        out_ref, mask_ref, target_ref = ref(torch.from_numpy(img1), torch.from_numpy(img2))

    pred, mask_j, target = model.apply(params, j1, j2, mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(mask_j), mask_ref.numpy())
    assert_close(np.asarray(target), target_ref.numpy(), name="croco target")
    assert_close(np.asarray(pred), out_ref.numpy(), name="croco pred")

    # criterion parity (MaskedMSE, both norm modes)
    from models.criterion import MaskedMSE

    for norm in (False, True):
        with torch.no_grad():
            ref_loss = MaskedMSE(norm_pix_loss=norm)(out_ref, mask_ref, target_ref)
        ours = masked_mse_loss(np.asarray(pred), np.asarray(mask_j), np.asarray(target),
                               norm_pix_loss=norm)
        assert_close(np.asarray(ours), np.asarray(float(ref_loss)), tol=1e-3,
                     name=f"masked_mse norm={norm}")


# ---------------------------------------------------------------------------
# LPIPS vs a torch oracle (the lpips pip package isn't installed; the oracle
# implements the published LPIPS-alex forward directly and the state dict uses
# the real lpips.LPIPS(net='alex') key layout)
# ---------------------------------------------------------------------------

_ALEX = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
         (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
_SLICE_IDX = [0, 3, 6, 8, 10]


def _torch_lpips(sd, a, b):
    """Reference LPIPS-alex forward (lpips/lpips.py + pretrained_networks.py):
    scale input, run alexnet features tapping post-relu slices 1-5 (maxpool
    after slices 1 and 2), unit-normalize channels, 1x1 lin heads, spatial
    mean, sum over layers."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        h = (x - shift) / scale
        out = []
        for i, (_, _, k, s, p) in enumerate(_ALEX):
            w = sd[f"net.slice{i+1}.{_SLICE_IDX[i]}.weight"]
            bias = sd[f"net.slice{i+1}.{_SLICE_IDX[i]}.bias"]
            h = F.relu(F.conv2d(h, w, bias, stride=s, padding=p))
            out.append(h)
            if i in (0, 1):
                h = F.max_pool2d(h, 3, 2)
        return out

    fa, fb = feats(a), feats(b)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        xn = x / x.norm(dim=1, keepdim=True).clamp(min=1e-10)
        yn = y / y.norm(dim=1, keepdim=True).clamp(min=1e-10)
        d = (xn - yn) ** 2
        lin = sd[f"lin{i}.model.1.weight"]
        total = total + F.conv2d(d, lin).mean(dim=(1, 2, 3))
    return total


@pytest.mark.parametrize("layout", ["lpips_full", "torchvision_merged"])
def test_lpips_golden(layout, tmp_path):
    from viewcrafter_tpu.utils import metrics

    g = torch.Generator().manual_seed(60)
    full = {}
    for i, (cin, cout, k, s, p) in enumerate(_ALEX):
        full[f"net.slice{i+1}.{_SLICE_IDX[i]}.weight"] = (
            torch.randn(cout, cin, k, k, generator=g) * (cin * k * k) ** -0.5
        )
        full[f"net.slice{i+1}.{_SLICE_IDX[i]}.bias"] = torch.randn(cout, generator=g) * 0.1
    for i, (_, cout, *_rest) in enumerate(_ALEX):
        full[f"lin{i}.model.1.weight"] = torch.rand(1, cout, 1, 1, generator=g) * 0.1

    if layout == "lpips_full":
        sd = full
    else:  # torchvision alexnet keys + official lin-only keys
        sd = {}
        for i, n in enumerate(_SLICE_IDX):
            sd[f"features.{n}.weight"] = full[f"net.slice{i+1}.{n}.weight"]
            sd[f"features.{n}.bias"] = full[f"net.slice{i+1}.{n}.bias"]
        for i in range(5):
            sd[f"lin{i}.model.1.weight"] = full[f"lin{i}.model.1.weight"]

    path = str(tmp_path / "lpips.pth")
    torch.save(sd, path)

    rng = np.random.default_rng(8)
    a = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = _torch_lpips(full, torch.from_numpy(a), torch.from_numpy(b)).numpy()

    metrics.load_lpips_weights(path)
    try:
        ours = metrics.lpips(
            jnp.transpose(jnp.asarray(a), (0, 2, 3, 1)),
            jnp.transpose(jnp.asarray(b), (0, 2, 3, 1)),
        )
        assert_close(np.asarray(ours), ref, tol=1e-3, name=f"lpips[{layout}]")
    finally:
        metrics._LPIPS_WEIGHTS = None


@pytest.mark.parametrize("mode", ["plain", "shift_inv", "scale_inv", "scale_shift_inv"])
def test_dust3r_loss_golden(mode):
    """conf_loss/regr3d_loss vs the reference ConfLoss(Regr3D*(L21)) stack
    (extern/dust3r/dust3r/losses.py:140-297) on synthetic two-view data."""
    from dust3r.losses import (
        L21, ConfLoss, Regr3D, Regr3D_ScaleInv, Regr3D_ScaleShiftInv, Regr3D_ShiftInv,
    )

    from viewcrafter_tpu.models.dust3r_losses import conf_loss

    cls = {
        "plain": Regr3D, "shift_inv": Regr3D_ShiftInv,
        "scale_inv": Regr3D_ScaleInv, "scale_shift_inv": Regr3D_ScaleShiftInv,
    }[mode]
    ref_loss = ConfLoss(cls(L21, norm_mode="avg_dis"), alpha=0.2)

    rng = np.random.default_rng(7)
    B, H, W = 2, 8, 12

    def rand_pose():
        poses = []
        for _ in range(B):
            a = rng.standard_normal((3, 3))
            q, _ = np.linalg.qr(a)
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = q
            m[:3, 3] = rng.standard_normal(3)
            poses.append(m)
        return np.stack(poses).astype(np.float32)

    def rand_pts():
        p = rng.standard_normal((B, H, W, 3)).astype(np.float32)
        p[..., 2] += 3.0  # positive-ish depth
        return p

    gt1 = {"camera_pose": rand_pose(), "pts3d": rand_pts(),
           "valid_mask": rng.random((B, H, W)) > 0.25}
    gt2 = {"camera_pose": rand_pose(), "pts3d": rand_pts(),
           "valid_mask": rng.random((B, H, W)) > 0.25}
    pred1 = {"pts3d": rand_pts(), "conf": 1.0 + np.exp(rng.standard_normal((B, H, W))).astype(np.float32)}
    pred2 = {"pts3d_in_other_view": rand_pts(),
             "conf": 1.0 + np.exp(rng.standard_normal((B, H, W))).astype(np.float32)}

    def t(d):
        return {k: torch.from_numpy(np.asarray(v)) for k, v in d.items()}

    with torch.no_grad():
        ref_total, _ = ref_loss(t(gt1), t(gt2), t(pred1), t(pred2))

    def j(d):
        return {k: jnp.asarray(v) for k, v in d.items()}

    total, _ = conf_loss(j(gt1), j(gt2), j(pred1), j(pred2), alpha=0.2, mode=mode)
    assert_close(np.asarray(total), np.asarray(float(ref_total)), tol=1e-3,
                 name=f"conf_loss[{mode}]")


def test_clip_vision_golden():
    from viewcrafter_tpu.config import CLIPVisionConfig
    from viewcrafter_tpu.models.clip import CLIPVisionEncoder
    from viewcrafter_tpu.utils.checkpoint import Translator, map_clip_vision

    cfg = CLIPVisionConfig(image_size=32, patch_size=8, width=32, heads=2, layers=2)
    ref = _TorchCLIPVision(cfg.image_size, cfg.patch_size, cfg.width, cfg.heads, cfg.layers).eval()
    randomize_(ref, 50)

    sd = {f"embedder.model.visual.{k}": v for k, v in ref.state_dict().items()}
    t = Translator(sd)
    map_clip_vision(t, layers=cfg.layers)
    params = {"params": t.nested()}

    model = CLIPVisionEncoder(cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 3, 32, 32), np.float32)

    jx = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    init_tree = model.init(jax.random.PRNGKey(0), jx)
    _assert_translated_matches_init(params, init_tree, "clip_vision")

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()
    y = model.apply(params, jx)
    assert_close(np.asarray(y), y_ref, name="clip_vision")


# ---------------------------------------------------------------------------
# DUSt3R linear head (pixel-shuffle) vs LinearPts3d
# ---------------------------------------------------------------------------


def test_dust3r_linear_head_golden():
    """head_type='linear' full-network parity (heads/linear_head.py:12-41):
    the F.pixel_shuffle channel order (c, dy, dx) is the wiring this test
    pins down — the DPT golden cannot catch it."""
    from dust3r.model import AsymmetricCroCo3DStereo

    from viewcrafter_tpu.config import Dust3rConfig
    from viewcrafter_tpu.models.dust3r import Dust3rModel
    from viewcrafter_tpu.utils.checkpoint import translate_dust3r_checkpoint

    H = W = 64
    inf = float("inf")
    ref = AsymmetricCroCo3DStereo(
        output_mode="pts3d", head_type="linear",
        depth_mode=("exp", -inf, inf), conf_mode=("exp", 1, inf),
        landscape_only=True, patch_embed_cls="PatchEmbedDust3R",
        img_size=(H, W), patch_size=16,
        enc_embed_dim=64, enc_depth=4, enc_num_heads=2,
        dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
        mlp_ratio=4, pos_embed="RoPE100",
    ).eval()
    randomize_(ref, 31)

    cfg = Dust3rConfig(
        img_size=(H, W), patch_size=16, head_type="linear",
        enc_embed_dim=64, enc_depth=4, enc_num_heads=2,
        dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
    )
    params = translate_dust3r_checkpoint(ref.state_dict(), cfg=cfg)

    model = Dust3rModel(cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    img1 = rng.standard_normal((1, 3, H, W), np.float32) * 0.5
    img2 = rng.standard_normal((1, 3, H, W), np.float32) * 0.5

    j1 = jnp.transpose(jnp.asarray(img1), (0, 2, 3, 1))
    j2 = jnp.transpose(jnp.asarray(img2), (0, 2, 3, 1))
    init_tree = model.init(jax.random.PRNGKey(0), j1, j2)
    _assert_translated_matches_init(params, init_tree, "dust3r_linear")

    true_shape = torch.tensor([[H, W]], dtype=torch.int32)
    with torch.no_grad():
        res1, res2 = ref(
            {"img": torch.from_numpy(img1), "true_shape": true_shape, "instance": ["0"]},
            {"img": torch.from_numpy(img2), "true_shape": true_shape, "instance": ["1"]},
        )

    out = model.apply(params, j1, j2)
    assert_close(np.asarray(out["pts3d1"]), res1["pts3d"].numpy(), name="linear pts3d1")
    assert_close(np.asarray(out["conf1"]), res1["conf"].numpy(), name="linear conf1")
    assert_close(
        np.asarray(out["pts3d2_in_view1"]), res2["pts3d_in_other_view"].numpy(),
        name="linear pts3d2",
    )
    assert_close(np.asarray(out["conf2"]), res2["conf"].numpy(), name="linear conf2")


# ---------------------------------------------------------------------------
# PairViewer vs reference (closed-form 2-view alignment)
# ---------------------------------------------------------------------------


def _stub_module(name, **attrs):
    import types

    try:
        __import__(name)
        return sys.modules[name]
    except ImportError:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod


def test_pair_viewer_golden():
    """Closed-form 2-view PairViewer vs reference cloud_opt/pair_viewer.py:
    Weiszfeld focal, PnP relative pose, conf-anchor choice, depth extraction.
    roma/torchvision are stubbed (unused on the PairViewer code path)."""

    class _Noop:
        def __init__(self, *a, **k):
            pass

    _stub_module("roma")
    tv = _stub_module("torchvision")
    tvt = _stub_module(
        "torchvision.transforms", Compose=_Noop, ToTensor=_Noop, Normalize=_Noop
    )
    if not hasattr(tv, "transforms"):
        tv.transforms = tvt
    pytest.importorskip("cv2")
    from dust3r.cloud_opt.pair_viewer import PairViewer

    from viewcrafter_tpu.align.global_align import SceneGraph
    from viewcrafter_tpu.align.pairs import pair_viewer

    H, W, FOCAL = 8, 12, 14.0
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))

    def cam_grid(depth):
        z = depth(uu, vv)
        return np.stack([z * (uu - W / 2) / FOCAL, z * (vv - H / 2) / FOCAL, z], -1)

    a = np.deg2rad(10.0)
    R1 = np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
    )
    pose1 = np.eye(4)
    pose1[:3, :3] = R1
    pose1[:3, 3] = [0.4, 0.1, -0.15]

    pts0 = cam_grid(lambda u, v: 2.0 + 0.05 * u + 0.02 * v + 0.3 * np.sin(0.8 * u) * np.cos(1.1 * v))
    pts1 = cam_grid(lambda u, v: 2.2 + 0.04 * u + 0.03 * v + 0.25 * np.cos(0.7 * u) * np.sin(0.9 * v))
    pts1_in0 = (pts1.reshape(-1, 3) @ pose1[:3, :3].T + pose1[:3, 3]).reshape(H, W, 3)
    w2c1 = np.linalg.inv(pose1)
    pts0_in1 = (pts0.reshape(-1, 3) @ w2c1[:3, :3].T + w2c1[:3, 3]).reshape(H, W, 3)

    # edge order [(0,1), (1,0)]; conf makes camera 0 the anchor
    pred_i = np.stack([pts0, pts1]).astype(np.float32)
    pred_j = np.stack([pts1_in0, pts0_in1]).astype(np.float32)
    conf_i = np.stack([np.full((H, W), 10.0), np.full((H, W), 6.0)]).astype(np.float32)
    conf_j = np.stack([np.full((H, W), 9.0), np.full((H, W), 5.0)]).astype(np.float32)

    view1 = {"idx": [0, 1]}
    view2 = {"idx": [1, 0]}
    pred1 = {"pts3d": torch.from_numpy(pred_i), "conf": torch.from_numpy(conf_i)}
    pred2 = {
        "pts3d_in_other_view": torch.from_numpy(pred_j),
        "conf": torch.from_numpy(conf_j),
    }
    ref = PairViewer(view1, view2, pred1, pred2)

    graph = SceneGraph(
        edges=np.array([(0, 1), (1, 0)]),
        pred_i=pred_i, pred_j=pred_j, conf_i=conf_i, conf_j=conf_j,
        imgs=np.zeros((2, H, W, 3), np.float32),
    )
    ours = pair_viewer(graph)

    ref_poses = ref.im_poses.detach().numpy()
    np.testing.assert_allclose(ours.poses, ref_poses, atol=2e-3)
    np.testing.assert_allclose(
        ours.focals, ref.focals.detach().numpy(), rtol=2e-3
    )
    ref_depths = np.stack([d.detach().numpy() for d in ref.depth])
    np.testing.assert_allclose(ours.depths, ref_depths, atol=2e-3, rtol=2e-3)
    # both must identify camera 0 (higher conf product) as the anchor
    np.testing.assert_allclose(ref_poses[0], np.eye(4), atol=1e-6)
    np.testing.assert_allclose(ours.poses[0], np.eye(4), atol=1e-6)
