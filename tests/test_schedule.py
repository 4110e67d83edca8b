import math

import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.ops import schedule as S


def test_linear_betas_endpoints():
    b = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    assert b.shape == (1000,)
    np.testing.assert_allclose(b[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(b[-1], 0.012, rtol=1e-12)
    # sqrt-space linearity
    s = np.sqrt(b)
    np.testing.assert_allclose(np.diff(s), np.diff(s)[0], rtol=1e-8)


def test_zero_terminal_snr():
    b = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    b2 = S.rescale_zero_terminal_snr(b)
    acp = np.cumprod(1 - b2)
    # terminal SNR is exactly zero, initial alpha_bar preserved
    assert abs(acp[-1]) < 1e-12
    np.testing.assert_allclose(acp[0], np.cumprod(1 - b)[0], rtol=1e-10)


def test_uniform_trailing_timesteps():
    ts = S.make_ddim_timesteps("uniform_trailing", 50, 1000)
    assert ts.shape == (50,)
    assert ts[-1] == 999  # trailing spacing ends at the final DDPM step
    assert ts[0] == 19
    np.testing.assert_array_equal(np.diff(ts), 20)

    ts_u = S.make_ddim_timesteps("uniform", 50, 1000)
    assert ts_u[0] == 1 and ts_u[-1] == 981


def test_ddim_schedule_ordering_and_sigmas():
    sched = S.DiffusionSchedule.create()
    dd = S.DDIMSchedule.create(sched, 50, eta=1.0, timestep_spacing="uniform_trailing")
    # descending timesteps: first sampling step is t=999
    assert dd.timesteps[0] == 999 and dd.timesteps[-1] == 19
    # alpha at t=999 is ~0 under zero-SNR
    assert dd.alphas[0] < 1e-10
    # last step's alpha_prev is alphas_cumprod[0]
    np.testing.assert_allclose(dd.alphas_prev[-1], sched.alphas_cumprod[0], rtol=1e-6)
    # eta=1 sigma formula
    a, ap = dd.alphas[10].astype(np.float64), dd.alphas_prev[10].astype(np.float64)
    np.testing.assert_allclose(
        dd.sigmas[10], np.sqrt((1 - ap) / (1 - a) * (1 - a / ap)), rtol=1e-5
    )
    # eta=0 -> all sigmas zero
    dd0 = S.DDIMSchedule.create(sched, 50, eta=0.0)
    assert np.all(dd0.sigmas == 0)


def test_dynamic_rescale_arrays():
    sched = S.DiffusionSchedule.create(base_scale=0.3, turning_step=400)
    assert sched.scale_arr is not None
    np.testing.assert_allclose(sched.scale_arr[0], 1.0)
    np.testing.assert_allclose(sched.scale_arr[399:], 0.3, rtol=1e-6)
    dd = S.DDIMSchedule.create(sched, 50)
    # descending order: step 0 is t=999 -> scale=0.3; last step t=19
    np.testing.assert_allclose(dd.scale_arr[0], 0.3, rtol=1e-6)
    np.testing.assert_allclose(dd.scale_arr[-1], sched.scale_arr[19], rtol=1e-6)
    # prev-scale of the last (lowest-t) step is scale_arr[0]=1.0 (the "bug fix"
    # in the reference sampler, samplers/ddim.py:35)
    np.testing.assert_allclose(dd.scale_arr_prev[-1], 1.0, rtol=1e-6)
    # elsewhere prev aligns with the next-lower step's own scale
    np.testing.assert_allclose(dd.scale_arr_prev[10], dd.scale_arr[11], rtol=1e-6)


def test_timestep_embedding_matches_manual():
    t = jnp.array([0.0, 1.0, 17.0, 999.0])
    dim = 320
    emb = np.asarray(S.timestep_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    expect = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    # fp32 trig argument-reduction error grows with |t*freq| (up to 999 here)
    np.testing.assert_allclose(emb, expect, atol=3e-3)
    np.testing.assert_allclose(emb[:3], expect[:3], atol=1e-4)
    # odd dim pads a zero column
    emb3 = S.timestep_embedding(t, 5)
    assert emb3.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(emb3)[:, -1], 0.0)


def test_rescale_noise_cfg():
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.normal(size=(2, 4, 3, 8, 8)), jnp.float32)
    cfg = jnp.asarray(rng.normal(scale=3.0, size=(2, 4, 3, 8, 8)), jnp.float32)
    out = np.asarray(S.rescale_noise_cfg(cfg, cond, 1.0))
    # full rescale matches cond std exactly
    np.testing.assert_allclose(
        out.std(axis=(1, 2, 3, 4)), np.asarray(cond).std(axis=(1, 2, 3, 4)), rtol=1e-4
    )
    out0 = np.asarray(S.rescale_noise_cfg(cfg, cond, 0.0))
    np.testing.assert_allclose(out0, np.asarray(cfg), rtol=1e-6)


def test_v_parameterization_roundtrip():
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(2, 3, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 3, 4, 4)), jnp.float32)
    sched = S.DiffusionSchedule.create()
    t = 537
    sa = float(sched.sqrt_alphas_cumprod[t])
    sb = float(sched.sqrt_one_minus_alphas_cumprod[t])
    x_t = sa * x0 + sb * eps
    v = sa * eps - sb * x0  # definition of v
    np.testing.assert_allclose(
        np.asarray(S.predict_eps_from_z_and_v(x_t, v, sa, sb)), np.asarray(eps), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(S.predict_start_from_z_and_v(x_t, v, sa, sb)), np.asarray(x0), atol=1e-5
    )
