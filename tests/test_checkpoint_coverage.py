"""Checkpoint-mapping coverage: every flax parameter path the models create
must be produced by the translator (and nothing extra). Catches naming drift
between the torch->flax mapping tables and the module definitions without
needing real checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viewcrafter_tpu.config import (
    CLIPTextConfig,
    CLIPVisionConfig,
    Dust3rConfig,
    ResamplerConfig,
    UNetConfig,
    VAEConfig,
    get_model_config,
)
from viewcrafter_tpu.utils import checkpoint as ck


class CoverageTranslator(ck.Translator):
    """take() returns a dummy; layout transforms neutralized; records paths."""

    def __init__(self):
        super().__init__({})
        self.dummy = np.zeros((1,), np.float32)

    def has(self, key):
        # pretend every optional weight exists (skip/nin_shortcut/ip/temporal)
        return True

    def take(self, key):
        self.used.add(key)
        return self.dummy


def _paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out |= _paths(v, p)
        else:
            out.add(p)
    return out


def _flatten_translated(t):
    return set(t.out.keys())


def _diff(translated, model):
    missing = sorted(model - translated)
    extra = sorted(translated - model)
    return missing, extra


@pytest.fixture(autouse=True)
def _identity_transforms(monkeypatch):
    for name in ["t_linear", "t_conv2d", "t_conv1d", "t_conv3d", "t_convtranspose2d"]:
        monkeypatch.setattr(ck, name, lambda w: w)
    yield


def test_unet_mapping_covers_tiny_model():
    cfg = get_model_config("viewcrafter_tiny")
    from viewcrafter_tpu.models.unet3d import UNet3D

    model = UNet3D(cfg=cfg.unet, dtype=jnp.float32)
    t = cfg.video_length
    h, w = cfg.diffusion.latent_size
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, t, h, w, cfg.unet.in_channels)), jnp.zeros((1,)),
        jnp.zeros((1, 77, cfg.unet.context_dim)),
    )
    model_paths = _paths(shapes["params"])
    tr = CoverageTranslator()
    ck.map_unet(tr, cfg=cfg.unet)
    missing, extra = _diff(_flatten_translated(tr), model_paths)
    assert not missing, f"unmapped model params: {missing[:10]}"
    # CoverageTranslator pretends every OPTIONAL torch weight exists; the only
    # legitimate extras are those optionals (skip convs when channels match,
    # image-cross-attn kv on self-attention layers)
    allowed = ("/skip/", "_ip/")
    bad = [e for e in extra if not any(a in e for a in allowed)]
    assert not bad, f"translator writes unknown paths: {bad[:10]}"


def test_vae_mapping_covers_model():
    from viewcrafter_tpu.models.vae import AutoencoderKL

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    model = AutoencoderKL(ch=cfg.ch, ch_mult=cfg.ch_mult, num_res_blocks=cfg.num_res_blocks,
                          dtype=jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    model_paths = _paths(shapes["params"])
    tr = CoverageTranslator()
    ck.map_vae(tr, cfg=cfg)
    missing, extra = _diff(_flatten_translated(tr), model_paths)
    # optional torch weights the coverage fake pretends exist: nin_shortcuts
    # (when channels match) and the boundary up/downsamples the model omits
    assert not missing, f"unmapped: {missing[:10]}"
    allowed = ("nin_shortcut", "upsample", "downsample")
    bad = [e for e in extra if not any(a in e for a in allowed)]
    assert not bad, bad[:10]


def test_clip_and_resampler_mapping_cover_models():
    from viewcrafter_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
    from viewcrafter_tpu.models.resampler import Resampler

    tcfg = CLIPTextConfig(vocab_size=100, width=64, heads=2, layers=3)
    text = CLIPTextEncoder(cfg=tcfg, dtype=jnp.float32)
    shapes = jax.eval_shape(text.init, jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    tr = CoverageTranslator()
    ck.map_clip_text(tr, layers=tcfg.layers)
    missing, extra = _diff(_flatten_translated(tr), _paths(shapes["params"]))
    assert not missing and not extra, (missing[:5], extra[:5])

    vcfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32, heads=2, layers=2)
    vision = CLIPVisionEncoder(cfg=vcfg, dtype=jnp.float32)
    shapes = jax.eval_shape(vision.init, jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))
    tr = CoverageTranslator()
    ck.map_clip_vision(tr, layers=vcfg.layers)
    missing, extra = _diff(_flatten_translated(tr), _paths(shapes["params"]))
    assert not missing and not extra, (missing[:5], extra[:5])

    rcfg = ResamplerConfig(dim=32, depth=2, dim_head=8, heads=2, num_queries=4,
                           embedding_dim=16, output_dim=24, video_length=2)
    res = Resampler(cfg=rcfg, dtype=jnp.float32)
    shapes = jax.eval_shape(res.init, jax.random.PRNGKey(0), jnp.zeros((1, 9, 16)))
    tr = CoverageTranslator()
    ck.map_resampler(tr, depth=rcfg.depth)
    missing, extra = _diff(_flatten_translated(tr), _paths(shapes["params"]))
    assert not missing and not extra, (missing[:5], extra[:5])


def test_dust3r_mapping_covers_model():
    from viewcrafter_tpu.models.dust3r import Dust3rModel

    cfg = Dust3rConfig(
        enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
        dec_embed_dim=32, dec_depth=4, dec_num_heads=2,
        dpt_feature_dim=16, dpt_hidden_dims=(8, 8, 16, 32),
    )
    model = Dust3rModel(cfg=cfg, dtype=jnp.float32)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
    )
    model_paths = _paths(shapes["params"])
    tr = CoverageTranslator()
    ck.map_dust3r(tr, cfg=cfg)
    missing, extra = _diff(_flatten_translated(tr), model_paths)
    assert not missing, f"unmapped: {missing[:10]}"
    # rcu1 exists in refinenet4 only in torch when it has a skip; we pretend
    # everything exists -> allow rcu extras only
    assert all("rcu1" in e for e in extra), extra[:10]
