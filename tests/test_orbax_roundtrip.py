import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.utils.checkpoint import load_params, save_params


def test_save_load_roundtrip(tmp_path):
    params = {
        "a": {"kernel": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
        "b": jnp.ones((4,), jnp.bfloat16),
    }
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    like = {
        "a": {"kernel": jnp.zeros((2, 3), jnp.float32)},
        "b": jnp.zeros((4,), jnp.bfloat16),
    }
    restored = load_params(path, like)
    np.testing.assert_array_equal(np.asarray(restored["a"]["kernel"]), np.asarray(params["a"]["kernel"]))
    assert restored["b"].dtype == jnp.bfloat16
