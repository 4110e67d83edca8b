"""viewcrafter_tpu — a TPU-native (JAX/XLA/Pallas) novel-view-synthesis video framework.

Capabilities mirror Drexubery/ViewCrafter (reference at /root/reference): lift 1-N
photos to a 3D point cloud with a DUSt3R-style two-view ViT, rasterize the cloud
along a camera trajectory into guidance frames with an on-device point-splat
z-buffer, and refine into a clean video with a latent video diffusion model
(3D U-Net, per-frame KL-VAE, OpenCLIP conditioning, v-prediction DDIM with CFG).

Everything is designed TPU-first: channels-last layouts, bf16 matmuls with fp32
norms/softmax, `lax`-loop samplers jitted once, Pallas kernels for the hot ops,
and `jax.sharding` meshes for multi-chip scaling.
"""

__version__ = "0.1.0"
