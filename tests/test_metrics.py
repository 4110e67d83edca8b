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


def _ssim_numpy_oracle(a, b, data_range=1.0):
    """Independent Wang et al. SSIM (11x11 Gaussian sigma=1.5, K1/K2 std),
    written directly from the paper as a second implementation."""
    import numpy as np

    size, sigma = 11, 1.5
    g = np.arange(size) - size // 2
    k1d = np.exp(-(g ** 2) / (2 * sigma ** 2))
    k = np.outer(k1d, k1d)
    k /= k.sum()
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2

    def filt2(img):
        h, w = img.shape
        out = np.zeros((h - size + 1, w - size + 1))
        for i in range(size):
            for j in range(size):
                out += k[i, j] * img[i:i + out.shape[0], j:j + out.shape[1]]
        return out

    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c].astype(np.float64), b[..., c].astype(np.float64)
        mx, my = filt2(x), filt2(y)
        sx = filt2(x * x) - mx ** 2
        sy = filt2(y * y) - my ** 2
        sxy = filt2(x * y) - mx * my
        s = ((2 * mx * my + c1) * (2 * sxy + c2)) / ((mx ** 2 + my ** 2 + c1) * (sx + sy + c2))
        vals.append(s)
    return float(np.mean(vals))


def test_ssim_matches_independent_oracle():
    rng = np.random.default_rng(3)
    a = rng.uniform(size=(24, 24, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
    ours = float(ssim(jnp.asarray(a)[None], jnp.asarray(b)[None])[0])
    ref = _ssim_numpy_oracle(a, b)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_video_metrics_always_reports_lpips_key():
    from viewcrafter_tpu.utils.metrics import lpips_available, video_metrics

    rng = np.random.default_rng(0)
    pred = rng.uniform(size=(2, 24, 24, 3)).astype(np.float32)
    gt = rng.uniform(size=(2, 24, 24, 3)).astype(np.float32)
    m = video_metrics(pred, gt)
    assert set(m) == {"psnr", "ssim", "lpips"}
    # without weights loaded LPIPS must be explicitly None, never missing
    if not lpips_available():
        assert m["lpips"] is None
    assert m["psnr"] > 0 and 0 <= m["ssim"] <= 1


def test_compute_metrics_script(tmp_path):
    """scripts/compute_metrics.py end-to-end on PNG frame dirs."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    from PIL import Image

    rng = np.random.default_rng(0)
    for name in ("pred", "gt"):
        d = tmp_path / name
        d.mkdir()
        for i in range(3):
            arr = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i:04d}.png")

    repo = Path(__file__).resolve().parents[1]
    out = subprocess.run(
        [sys.executable, str(repo / "scripts" / "compute_metrics.py"),
         "--pred", str(tmp_path / "pred"), "--gt", str(tmp_path / "gt")],
        capture_output=True, text=True, cwd=str(repo), timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][-1]
    m = json.loads(line)
    assert set(m) >= {"psnr", "ssim", "lpips"}
    assert m["lpips"] is None  # no weights -> explicitly skipped
