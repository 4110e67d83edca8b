import jax
import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.config import CLIPTextConfig, CLIPVisionConfig, ResamplerConfig
from viewcrafter_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder, clip_preprocess
from viewcrafter_tpu.models.resampler import Resampler
from viewcrafter_tpu.utils import tokenizer as tk

TINY_TEXT = CLIPTextConfig(vocab_size=1000, width=64, heads=2, layers=3)
TINY_VISION = CLIPVisionConfig(image_size=28, patch_size=14, width=32, heads=2, layers=2)
TINY_RESAMPLER = ResamplerConfig(
    dim=32, depth=2, dim_head=8, heads=2, num_queries=4, embedding_dim=16,
    output_dim=24, video_length=4,
)


def test_tokenizer_fallback_framing():
    ids = tk.tokenize(["rotating view of a scene", ""])
    assert ids.shape == (2, 77)
    assert ids[0, 0] == tk.SOT
    assert tk.EOT in ids[0]
    # empty prompt: sot, eot, zeros
    assert ids[1, 0] == tk.SOT and ids[1, 1] == tk.EOT and ids[1, 2] == 0
    # deterministic
    np.testing.assert_array_equal(ids, tk.tokenize(["rotating view of a scene", ""]))


def test_text_encoder_causality():
    """Causal mask: token t's output must not depend on tokens > t."""
    model = CLIPTextEncoder(cfg=TINY_TEXT, dtype=jnp.float32)
    ids = jnp.zeros((1, 77), jnp.int32).at[0, :5].set(jnp.arange(5) + 1)
    params = model.init(jax.random.PRNGKey(0), ids)
    out1 = model.apply(params, ids)
    ids2 = ids.at[0, 50].set(7)  # change a late token
    out2 = model.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(out1[0, :5]), np.asarray(out2[0, :5]), atol=1e-5)
    assert out1.shape == (1, 77, 64)


def test_text_encoder_penultimate_params_exist():
    """The skipped final block's params must still exist for checkpoint loads."""
    model = CLIPTextEncoder(cfg=TINY_TEXT, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    assert f"block_{TINY_TEXT.layers - 1}" in params["params"]


def test_vision_encoder_token_count():
    model = CLIPVisionEncoder(cfg=TINY_VISION, dtype=jnp.float32)
    x = jnp.zeros((2, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    grid = (28 // 14) ** 2
    assert out.shape == (2, grid + 1, 32)


def test_clip_preprocess_range():
    img = jnp.zeros((1, 64, 96, 3))  # [-1,1] gray 0 -> [0,1] 0.5
    out = np.asarray(clip_preprocess(img))
    assert out.shape == (1, 224, 224, 3)
    expect = (0.5 - np.array(tk_mean := [0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711]
    )
    np.testing.assert_allclose(out[0, 100, 100], expect, atol=1e-5)


def test_resampler_shapes_and_input_dependence():
    model = Resampler(cfg=TINY_RESAMPLER, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(2, 9, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x1)
    out1 = model.apply(params, x1)
    assert out1.shape == (2, 4 * 4, 24)  # num_queries * video_length
    x2 = jnp.asarray(rng.normal(size=(2, 9, 16)), jnp.float32)
    out2 = model.apply(params, x2)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-6
