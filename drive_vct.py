"""Drive viewcrafter_tpu public API on the real TPU (jitted throughout)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from viewcrafter_tpu.config import get_model_config
from viewcrafter_tpu.models.unet3d import UNet3D
from viewcrafter_tpu.models.vae import AutoencoderKL

cfg = get_model_config("viewcrafter_25_512")
model = UNet3D(cfg=cfg.unet)
b, t = 1, cfg.video_length
h, w = cfg.diffusion.latent_size
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (b, t, h, w, 8), jnp.float32)
ctx = jax.random.normal(rng, (b, 77 + 16*16, 1024), jnp.float32)
ts = jnp.array([999.0])
t0 = time.time()
params = jax.jit(model.init)(jax.random.PRNGKey(1), x, ts, ctx)
params = jax.block_until_ready(params)
n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
print(f"UNet init(jit): {n_params/1e6:.1f}M params in {time.time()-t0:.1f}s", flush=True)
fwd = jax.jit(model.apply)
t0 = time.time(); y = jax.block_until_ready(fwd(params, x, ts, ctx)); print(f"UNet fwd compile+run: {time.time()-t0:.1f}s out {y.shape}", flush=True)
for _ in range(2):
    t0 = time.time(); y = jax.block_until_ready(fwd(params, x, ts, ctx)); dt=time.time()-t0
print(f"UNet fwd steady: {dt*1000:.0f}ms finite={bool(jnp.isfinite(y).all())}", flush=True)

vae = AutoencoderKL()
img = jax.random.uniform(rng, (1, cfg.height, cfg.width, 3)) * 2 - 1
vparams = jax.block_until_ready(jax.jit(vae.init)(jax.random.PRNGKey(2), img))
enc = jax.jit(lambda p, x: vae.apply(p, x, method=AutoencoderKL.encode))
dec = jax.jit(lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode))
t0=time.time(); z = jax.block_until_ready(enc(vparams, img)); print(f"VAE enc compile+run {time.time()-t0:.1f}s z {z.shape}", flush=True)
t0=time.time(); rec = jax.block_until_ready(dec(vparams, z)); print(f"VAE dec compile+run {time.time()-t0:.1f}s rec {rec.shape}", flush=True)
t0=time.time(); z=jax.block_until_ready(enc(vparams,img)); rec=jax.block_until_ready(dec(vparams,z)); print(f"VAE enc+dec steady {1000*(time.time()-t0):.0f}ms finite={bool(jnp.isfinite(rec).all())}", flush=True)
