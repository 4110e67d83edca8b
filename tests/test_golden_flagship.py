"""Flagship-config golden parity tests (VERDICT r2 #3).

The small goldens in test_golden_torch.py prove the translation at toy dims;
these instantiate the reference modules at the REAL released configurations —
viewcrafter_25 (configs/inference_pvd_1024.yaml:33-111) and
DUSt3R_ViTLarge_BaseDecoder_512_dpt (extern/dust3r/dust3r/model.py:154) — with
random weights, and assert activation parity. This is the only pre-checkpoint
evidence that the flagship wiring (320ch, mult [1,2,4,4], heads=ch/64,
attention at ds {1,2,4}, 25-frame context split at 77+25*16, ViT-L 1024x24 +
Base decoder 768x12 + DPT) translates correctly at scale.

The UNet/dust3r spatial extent is reduced (24x32 latent / 288x512 image is the
real dust3r working size; the UNet's full 72x128 latent is ~36x the FLOPs of
24x32 with IDENTICAL parameter shapes, head counts, level routing and context
split — spatial size changes no wiring). Set VIEWCRAFTER_GOLDEN_FULL=1 to run
the UNet at the true 72x128 latent (adds ~1h of CPU time).

All tests are marked slow (minutes each on the 1-core CI box).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "lvdm")), reason="reference tree absent"
    ),
]
for _p in (REF, os.path.join(REF, "extern", "dust3r"),
           os.path.join(REF, "extern", "dust3r", "croco")):
    if os.path.isdir(_p) and _p not in sys.path:
        sys.path.append(_p)

from tests.test_golden_torch import assert_close  # noqa: E402
from tests.test_golden_torch import _assert_translated_matches_init, randomize_  # noqa: E402

torch.set_num_threads(max(1, (os.cpu_count() or 2)))


def test_unet_flagship_golden():
    """Full viewcrafter_25 UNet: one denoiser forward (= the UNet eval inside a
    DDIM step) vs lvdm UNetModel at the released config
    (configs/inference_pvd_1024.yaml:33-64), T=25, ctx 77+25*16 x 1024."""
    from lvdm.modules.networks.openaimodel3d import UNetModel

    from viewcrafter_tpu.config import get_model_config
    from viewcrafter_tpu.models.unet3d import UNet3D
    from viewcrafter_tpu.utils.checkpoint import Translator, map_unet

    cfg = get_model_config("viewcrafter_25").unet
    T = 25
    if os.environ.get("VIEWCRAFTER_GOLDEN_FULL"):
        H, W = 72, 128  # the true 576x1024 f8 latent
    else:
        H, W = 24, 32

    ref = UNetModel(
        in_channels=cfg.in_channels, model_channels=cfg.model_channels,
        out_channels=cfg.out_channels, num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=list(cfg.attention_resolutions), dropout=0.1,
        channel_mult=list(cfg.channel_mult), context_dim=cfg.context_dim,
        num_head_channels=cfg.num_head_channels,
        transformer_depth=cfg.transformer_depth, use_linear=True,
        use_checkpoint=False, temporal_conv=True, temporal_attention=True,
        temporal_selfatt_only=True, use_relative_position=False,
        use_causal_attention=False, temporal_length=cfg.temporal_length,
        addition_attention=True, image_cross_attention=True,
        default_fs=cfg.default_fs, fs_condition=True,
    ).eval()
    randomize_(ref, 100)

    sd = {f"model.diffusion_model.{k}": v for k, v in ref.state_dict().items()}
    t = Translator(sd)
    map_unet(t, cfg=cfg)
    params = {"params": t.nested()}

    model = UNet3D(cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(101)
    x = rng.standard_normal((1, cfg.in_channels, T, H, W), np.float32)
    ctx = rng.standard_normal(
        (1, cfg.text_context_len + T * 16, cfg.context_dim), np.float32)
    ts = np.array([777], np.int64)
    fs = np.array([10], np.int64)

    jx = jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1))
    init_tree = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jx, jnp.asarray(ts),
                           jnp.asarray(ctx), fs=jnp.asarray(fs, jnp.float32)))
    _assert_translated_matches_init(params, init_tree, "unet flagship")

    with torch.no_grad():
        y_ref = ref(
            torch.from_numpy(x), torch.from_numpy(ts),
            context=torch.from_numpy(ctx), fs=torch.from_numpy(fs),
        ).numpy()

    y = jax.jit(model.apply)(
        params, jx, jnp.asarray(ts), jnp.asarray(ctx),
        fs=jnp.asarray(fs, jnp.float32))
    assert_close(np.transpose(np.asarray(y), (0, 4, 1, 2, 3)), y_ref,
                 name="unet flagship")


def test_vae_flagship_golden():
    """Full KL-f8 VAE (ch=128, mult [1,2,4,4], 2 res blocks,
    configs/inference_pvd_1024.yaml:72-90): encode moments + decode."""
    from lvdm.modules.networks.ae_modules import Decoder as RefDecoder
    from lvdm.modules.networks.ae_modules import Encoder as RefEncoder

    from viewcrafter_tpu.config import get_model_config
    from viewcrafter_tpu.models.vae import AutoencoderKL
    from viewcrafter_tpu.utils.checkpoint import Translator, map_vae

    cfg = get_model_config("viewcrafter_25").vae
    dd = dict(ch=cfg.ch, out_ch=3, ch_mult=tuple(cfg.ch_mult),
              num_res_blocks=cfg.num_res_blocks, attn_resolutions=[],
              in_channels=3, resolution=256, z_channels=cfg.z_channels)
    enc = RefEncoder(double_z=True, **dd).eval()
    dec = RefDecoder(**dd).eval()
    quant = torch.nn.Conv2d(2 * cfg.z_channels, 2 * cfg.embed_dim, 1)
    post_quant = torch.nn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)
    for i, m in enumerate([enc, dec, quant, post_quant]):
        randomize_(m, 110 + i)

    sd = {}
    for prefix, m in [("encoder", enc), ("decoder", dec),
                      ("quant_conv", quant), ("post_quant_conv", post_quant)]:
        for k, v in m.state_dict().items():
            sd[f"first_stage_model.{prefix}.{k}"] = v

    t = Translator(sd)
    map_vae(t, cfg=cfg)
    params = {"params": t.nested()}

    model = AutoencoderKL(ch=cfg.ch, ch_mult=cfg.ch_mult,
                          num_res_blocks=cfg.num_res_blocks,
                          embed_dim=cfg.embed_dim, z_channels=cfg.z_channels,
                          dtype=jnp.float32)
    rng = np.random.default_rng(111)
    x = rng.standard_normal((1, 3, 64, 64), np.float32)
    z = rng.standard_normal((1, cfg.embed_dim, 8, 8), np.float32) * 0.5

    init_tree = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))))
    _assert_translated_matches_init(params, init_tree, "vae flagship")

    with torch.no_grad():
        moments_ref = quant(enc(torch.from_numpy(x)))
        mean_ref = moments_ref[:, :cfg.embed_dim].numpy()
        logvar_ref = torch.clamp(moments_ref[:, cfg.embed_dim:], -30.0, 20.0).numpy()
        dec_ref = dec(post_quant(torch.from_numpy(z))).numpy()

    mean, logvar = jax.jit(
        lambda p, v: model.apply(p, v, method=AutoencoderKL.encode_moments)
    )(params, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    assert_close(np.transpose(np.asarray(mean), (0, 3, 1, 2)), mean_ref,
                 name="vae flagship mean")
    assert_close(np.transpose(np.asarray(logvar), (0, 3, 1, 2)), logvar_ref,
                 name="vae flagship logvar")
    out = jax.jit(lambda p, v: model.apply(p, v, method=AutoencoderKL.decode))(
        params, jnp.transpose(jnp.asarray(z), (0, 2, 3, 1)))
    assert_close(np.transpose(np.asarray(out), (0, 3, 1, 2)), dec_ref,
                 name="vae flagship decode")


def test_dust3r512_flagship_golden():
    """DUSt3R_ViTLarge_BaseDecoder_512_dpt at its real working size: ViT-L
    encoder (1024x24xh16), Base decoder (768x12xh12), DPT head, ManyAR patch
    embed, two 288x512 views (extern/dust3r/dust3r/model.py:154,
    the pipeline's 512-long-side working resolution)."""
    from dust3r.model import AsymmetricCroCo3DStereo

    from viewcrafter_tpu.config import get_dust3r_config
    from viewcrafter_tpu.models.dust3r import Dust3rModel
    from viewcrafter_tpu.utils.checkpoint import translate_dust3r_checkpoint

    cfg = get_dust3r_config("dust3r_512")
    H, W = 288, 512
    inf = float("inf")
    ref = AsymmetricCroCo3DStereo(
        output_mode="pts3d", head_type="dpt",
        depth_mode=("exp", -inf, inf), conf_mode=("exp", 1, inf),
        landscape_only=False, patch_embed_cls="ManyAR_PatchEmbed",
        img_size=tuple(cfg.img_size), patch_size=cfg.patch_size,
        enc_embed_dim=cfg.enc_embed_dim, enc_depth=cfg.enc_depth,
        enc_num_heads=cfg.enc_num_heads, dec_embed_dim=cfg.dec_embed_dim,
        dec_depth=cfg.dec_depth, dec_num_heads=cfg.dec_num_heads,
        mlp_ratio=4, pos_embed="RoPE100",
    ).eval()
    randomize_(ref, 120)

    params = translate_dust3r_checkpoint(ref.state_dict(), cfg=cfg)
    model = Dust3rModel(cfg=cfg, dtype=jnp.float32)

    rng = np.random.default_rng(121)
    img1 = rng.standard_normal((1, 3, H, W), np.float32) * 0.5
    img2 = rng.standard_normal((1, 3, H, W), np.float32) * 0.5

    true_shape = torch.tensor([[H, W]], dtype=torch.int32)
    with torch.no_grad():
        res1, res2 = ref(
            {"img": torch.from_numpy(img1), "true_shape": true_shape,
             "instance": ["0"]},
            {"img": torch.from_numpy(img2), "true_shape": true_shape,
             "instance": ["1"]},
        )

    j1 = jnp.transpose(jnp.asarray(img1), (0, 2, 3, 1))
    j2 = jnp.transpose(jnp.asarray(img2), (0, 2, 3, 1))
    out = jax.jit(model.apply)(params, j1, j2)
    assert_close(np.asarray(out["pts3d1"]), res1["pts3d"].numpy(),
                 name="dust3r512 pts3d1")
    assert_close(np.asarray(out["conf1"]), res1["conf"].numpy(),
                 name="dust3r512 conf1")
    assert_close(np.asarray(out["pts3d2_in_view1"]),
                 res2["pts3d_in_other_view"].numpy(), name="dust3r512 pts3d2")
    assert_close(np.asarray(out["conf2"]), res2["conf"].numpy(),
                 name="dust3r512 conf2")
