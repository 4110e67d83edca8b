import jax
import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.config import Dust3rConfig
from viewcrafter_tpu.models.dust3r import Dust3rModel, patch_positions
from viewcrafter_tpu.ops.rope2d import rope_2d

TINY = Dust3rConfig(
    enc_embed_dim=64,
    enc_depth=2,
    enc_num_heads=2,
    dec_embed_dim=32,
    dec_depth=4,
    dec_num_heads=2,
    dpt_feature_dim=16,
    dpt_hidden_dims=(8, 8, 16, 32),
)


def test_rope2d_matches_reference_math():
    """Oracle: the torch fallback algorithm (pos_embed.py:112-159) re-derived
    in numpy."""
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 6, 2, 8
    tokens = rng.normal(size=(b, s, h, d)).astype(np.float32)
    pos = rng.integers(0, 10, size=(b, s, 2))
    base = 100.0

    def rope1d_np(tok, pos1d):
        dd = tok.shape[-1]
        inv = 1.0 / (base ** (np.arange(0, dd, 2) / dd))
        ang = pos1d[..., None] * inv  # (b, s, dd/2)
        ang = np.concatenate([ang, ang], -1)[:, :, None, :]  # (b, s, 1, dd)
        cos, sin = np.cos(ang), np.sin(ang)
        x1, x2 = tok[..., : dd // 2], tok[..., dd // 2 :]
        rot = np.concatenate([-x2, x1], -1)
        return tok * cos + rot * sin

    y, x = tokens[..., : d // 2], tokens[..., d // 2 :]
    expect = np.concatenate([rope1d_np(y, pos[..., 0]), rope1d_np(x, pos[..., 1])], -1)
    got = np.asarray(rope_2d(jnp.asarray(tokens), jnp.asarray(pos), base))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_rope2d_zero_position_is_identity():
    tokens = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 2, 8)), jnp.float32)
    pos = jnp.zeros((1, 4, 2), jnp.int32)
    np.testing.assert_allclose(np.asarray(rope_2d(tokens, pos)), np.asarray(tokens), atol=1e-6)


def test_patch_positions_row_major():
    pos = np.asarray(patch_positions(2, 3))
    np.testing.assert_array_equal(
        pos, [[0, 0], [0, 1], [0, 2], [1, 0], [1, 1], [1, 2]]
    )


def test_dust3r_forward_shapes():
    model = Dust3rModel(cfg=TINY, dtype=jnp.float32)
    h, w = 32, 48
    img1 = jnp.zeros((1, h, w, 3))
    img2 = jnp.ones((1, h, w, 3)) * 0.1
    params = model.init(jax.random.PRNGKey(0), img1, img2)
    out = model.apply(params, img1, img2)
    assert out["pts3d1"].shape == (1, h, w, 3)
    assert out["pts3d2_in_view1"].shape == (1, h, w, 3)
    assert out["conf1"].shape == (1, h, w)
    # conf = 1 + exp(x) > 1 always
    assert float(np.asarray(out["conf1"]).min()) > 1.0
    assert np.isfinite(np.asarray(out["pts3d1"])).all()


def test_dust3r_asymmetry():
    """Swapping the two views must change the outputs (two different decoders
    + heads; view2 pts in view1 frame)."""
    model = Dust3rModel(cfg=TINY, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    img1 = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    img2 = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img1, img2)
    a = model.apply(params, img1, img2)
    b = model.apply(params, img2, img1)
    assert np.abs(np.asarray(a["pts3d1"]) - np.asarray(b["pts3d1"])).max() > 1e-6


def test_encode_decode_pairs_matches_monolithic():
    """The encode-once + decode_pairs split (symmetrized-pair encoder dedup,
    reference model.py:117-125) must reproduce the monolithic __call__ on a
    symmetric pair batch."""
    model = Dust3rModel(cfg=TINY, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    h, w = 32, 48
    imgs = jnp.asarray(rng.normal(size=(3, h, w, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs[:1], imgs[1:2])

    pairs = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]
    ii = jnp.asarray([i for i, _ in pairs], jnp.int32)
    jj = jnp.asarray([j for _, j in pairs], jnp.int32)

    ref = model.apply(params, imgs[np.asarray(ii)], imgs[np.asarray(jj)])
    tokens, pos = model.apply(params, imgs, method=Dust3rModel.encode)
    got = model.apply(params, tokens, pos, ii, jj, h, w,
                      method=Dust3rModel.decode_pairs)
    for key in ("pts3d1", "pts3d2_in_view1", "conf1", "conf2"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), rtol=2e-4, atol=2e-4)


def test_encode_decode_pairs_portrait():
    """Portrait (ManyAR) flag parity between the two paths."""
    model = Dust3rModel(cfg=TINY, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    h, w = 32, 48  # stored landscape
    imgs = jnp.asarray(rng.normal(size=(2, h, w, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs[:1], imgs[1:2])
    ii = jnp.asarray([0, 1], jnp.int32)
    jj = jnp.asarray([1, 0], jnp.int32)
    ref = model.apply(params, imgs[np.asarray(ii)], imgs[np.asarray(jj)],
                      is_portrait1=True, is_portrait2=True)
    tokens, pos = model.apply(params, imgs, is_portrait=True,
                              method=Dust3rModel.encode)
    got = model.apply(params, tokens, pos, ii, jj, h, w,
                      is_portrait1=True, is_portrait2=True,
                      method=Dust3rModel.decode_pairs)
    for key in ("pts3d1", "pts3d2_in_view1", "conf1", "conf2"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), rtol=2e-4, atol=2e-4)
