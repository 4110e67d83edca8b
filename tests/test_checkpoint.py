"""Checkpoint translation parity vs torch oracles (torch CPU available)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import flax.linen as nn

from viewcrafter_tpu.utils import checkpoint as ck

torch.manual_seed(0)


def test_linear_transform():
    lin = tnn.Linear(6, 4)
    x = torch.randn(2, 6)
    expect = lin(x).detach().numpy()
    k = ck.t_linear(lin.weight.detach().numpy())
    got = np.asarray(x.numpy() @ k + lin.bias.detach().numpy())
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_conv2d_transform():
    conv = tnn.Conv2d(3, 5, 3, padding=1)
    x = torch.randn(1, 3, 8, 8)
    expect = conv(x).detach().numpy().transpose(0, 2, 3, 1)
    fl = nn.Conv(5, (3, 3), padding="SAME")
    params = {"params": {"kernel": jnp.asarray(ck.t_conv2d(conv.weight.detach().numpy())),
                         "bias": jnp.asarray(conv.bias.detach().numpy())}}
    got = np.asarray(fl.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_conv2d_stride2_transform():
    """Torch stride-2 pad-1 conv == flax explicit ((1,1),(1,1)) padding (the
    convention our Downsample/DPT use; XLA SAME would differ)."""
    conv = tnn.Conv2d(4, 6, 3, stride=2, padding=1)
    x = torch.randn(1, 4, 16, 16)
    expect = conv(x).detach().numpy().transpose(0, 2, 3, 1)
    fl = nn.Conv(6, (3, 3), strides=2, padding=((1, 1), (1, 1)))
    params = {"params": {"kernel": jnp.asarray(ck.t_conv2d(conv.weight.detach().numpy())),
                         "bias": jnp.asarray(conv.bias.detach().numpy())}}
    got = np.asarray(fl.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_conv3d_transform():
    conv = tnn.Conv3d(4, 4, (3, 1, 1), padding=(1, 0, 0))
    x = torch.randn(1, 4, 5, 6, 6)
    expect = conv(x).detach().numpy().transpose(0, 2, 3, 4, 1)  # B,T,H,W,C
    fl = nn.Conv(4, (3, 1, 1), padding="SAME")
    params = {"params": {"kernel": jnp.asarray(ck.t_conv3d(conv.weight.detach().numpy())),
                         "bias": jnp.asarray(conv.bias.detach().numpy())}}
    got = np.asarray(fl.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_convtranspose2d_transform():
    """Non-overlapping upsample convs as in the DPT head (k=stride)."""
    for k in (2, 4):
        conv = tnn.ConvTranspose2d(5, 7, k, stride=k)
        x = torch.randn(1, 5, 6, 6)
        expect = conv(x).detach().numpy().transpose(0, 2, 3, 1)
        fl = nn.ConvTranspose(7, (k, k), strides=(k, k))
        params = {
            "params": {
                "kernel": jnp.asarray(ck.t_convtranspose2d(conv.weight.detach().numpy())),
                "bias": jnp.asarray(conv.bias.detach().numpy()),
            }
        }
        got = np.asarray(fl.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, expect, atol=1e-5)


def test_groupnorm_parity():
    gn = tnn.GroupNorm(4, 8, eps=1e-6)
    with torch.no_grad():
        gn.weight.normal_()
        gn.bias.normal_()
    x = torch.randn(2, 8, 4, 4)
    expect = gn(x).detach().numpy().transpose(0, 2, 3, 1)
    from viewcrafter_tpu.models.layers import GroupNorm32

    m = GroupNorm32(num_groups=4, eps=1e-6)
    params = {
        "params": {
            "GroupNorm_0": {
                "scale": jnp.asarray(gn.weight.detach().numpy()),
                "bias": jnp.asarray(gn.bias.detach().numpy()),
            }
        }
    }
    got = np.asarray(m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_clip_block_parity():
    """Our CLIPBlock with translated weights matches a torch open_clip-style
    residual attention block (packed qkv MultiheadAttention + GELU MLP)."""
    width, heads, s = 32, 4, 7

    class TorchBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = tnn.LayerNorm(width)
            self.attn = tnn.MultiheadAttention(width, heads, batch_first=True)
            self.ln_2 = tnn.LayerNorm(width)
            self.mlp = tnn.Sequential()
            self.mlp.c_fc = tnn.Linear(width, width * 4)
            self.mlp.c_proj = tnn.Linear(width * 4, width)

        def forward(self, x, mask):
            a, _ = self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x),
                             attn_mask=mask, need_weights=False)
            x = x + a
            x = x + self.mlp.c_proj(tF.gelu(self.mlp.c_fc(self.ln_2(x))))
            return x

    tb = TorchBlock().eval()
    x = torch.randn(2, s, width)
    causal = torch.triu(torch.full((s, s), float("-inf")), diagonal=1)
    expect = tb(x, causal).detach().numpy()

    sd = {f"blk.{k}": v for k, v in tb.state_dict().items()}
    sd["blk.attn.in_proj_weight"] = sd.pop("blk.attn.in_proj_weight")
    t = ck.Translator(sd)
    ck._map_clip_block(t, "blk", "b")
    tree = t.nested()["b"]

    from viewcrafter_tpu.models.clip import CLIPBlock

    m = CLIPBlock(width, heads, dtype=jnp.float32)
    mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
    got = np.asarray(m.apply({"params": tree}, jnp.asarray(x.numpy()), mask))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_normalize_lvdm_quirks():
    sd = {
        "state_dict": {
            "model.diffusion_model.framestride_embed.0.weight": torch.zeros(2, 2),
            "other": torch.ones(1),
        }
    }
    out = ck.normalize_lvdm_state_dict(sd)
    assert "model.diffusion_model.fps_embedding.0.weight" in out

    ds = {"state_dict": {"module": {"module.a.b": torch.zeros(1)}}}
    out = ck.normalize_lvdm_state_dict(ds)
    assert "a.b" in out


def test_normalize_dust3r_duplicates_decoder2():
    sd = {"model": {"dec_blocks.0.norm1.weight": torch.zeros(3)}}
    out = ck.normalize_dust3r_state_dict(sd)
    assert "dec_blocks2.0.norm1.weight" in out


def test_verify_tree_shapes_reports_mismatches():
    ref = {"a": {"kernel": np.zeros((3, 4))}, "b": np.zeros(2)}
    good = {"a": {"kernel": np.zeros((3, 4))}, "b": np.zeros(2)}
    assert ck.verify_tree_shapes(good, ref) == []
    bad = {"a": {"kernel": np.zeros((4, 3))}}
    errs = ck.verify_tree_shapes(bad, ref)
    assert any("shape" in e for e in errs) and any("missing" in e for e in errs)


def test_convert_cli_dust3r(tmp_path):
    """python -m viewcrafter_tpu.convert on a real (tiny) torch DUSt3R
    checkpoint: translate -> shape-verify -> orbax -> reload parity."""
    import sys

    import numpy as np
    import jax

    for _p in ("/root/reference/extern/dust3r", "/root/reference/extern/dust3r/croco"):
        if _p not in sys.path:
            sys.path.append(_p)
    dust3r_model = pytest.importorskip("dust3r.model")
    AsymmetricCroCo3DStereo = dust3r_model.AsymmetricCroCo3DStereo

    from viewcrafter_tpu import convert
    from viewcrafter_tpu.config import DUST3R_REGISTRY, Dust3rConfig
    from viewcrafter_tpu.utils.checkpoint import load_params

    inf = float("inf")
    ref = AsymmetricCroCo3DStereo(
        output_mode="pts3d", head_type="dpt",
        depth_mode=("exp", -inf, inf), conf_mode=("exp", 1, inf),
        landscape_only=True, patch_embed_cls="PatchEmbedDust3R",
        img_size=(64, 64), patch_size=16,
        enc_embed_dim=64, enc_depth=4, enc_num_heads=2,
        dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
        mlp_ratio=4, pos_embed="RoPE100",
    )
    pth = tmp_path / "tiny_dust3r.pth"
    torch.save({"model": ref.state_dict()}, str(pth))

    name = "dust3r_convert_test"
    DUST3R_REGISTRY.setdefault(name, Dust3rConfig(
        img_size=(64, 64), patch_size=16,
        enc_embed_dim=64, enc_depth=4, enc_num_heads=2,
        dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
    ))
    out = str(tmp_path / "flax_dust3r")
    convert.main(["--dust3r_path", str(pth), "--dust3r_model", name,
                  "--out", out, "--dtype", "fp32"])
    tree = load_params(out)
    w_ref = ref.state_dict()["patch_embed.proj.weight"].numpy()
    w = np.asarray(jax.tree.leaves(
        tree["params"]["encoder"]["patch_embed"])[0] if False else
        tree["params"]["encoder"]["patch_embed"]["kernel"])
    # conv2d translate: OIHW -> HWIO
    np.testing.assert_allclose(w, np.transpose(w_ref, (2, 3, 1, 0)), atol=0)
