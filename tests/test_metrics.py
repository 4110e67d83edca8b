import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.utils.metrics import psnr, ssim


def test_psnr_known_values():
    a = jnp.zeros((1, 16, 16, 3))
    np.testing.assert_allclose(float(psnr(a, a + 0.1)[0]), 20.0, atol=1e-4)
    assert float(psnr(a, a)[0]) > 100  # identical -> clipped huge


def test_ssim_identity_and_degradation():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    np.testing.assert_allclose(float(ssim(a, a)[0]), 1.0, atol=1e-5)
    noisy = a + jnp.asarray(rng.normal(scale=0.2, size=a.shape), jnp.float32)
    assert float(ssim(a, noisy)[0]) < 0.9
    # smooth shift degrades SSIM less than noise of equal energy
    shifted = a + 0.2
    assert float(ssim(a, shifted)[0]) > float(ssim(a, noisy)[0])
