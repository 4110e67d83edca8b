"""Gradio web demo (single_view_txt mode), mirroring the reference app
(gradio_app.py:19-91 + viewcrafter.py:436-462): upload one image, set
elevation / center_scale / a pose-offset trajectory / steps / seed, get the
rendered guidance video and the diffused novel-view video.

Gradio isn't bundled in every environment; the import is deferred so the rest
of the framework never depends on it.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np


def build_demo(opts=None):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "gradio is not installed in this environment; the CLI "
            "(python -m viewcrafter_tpu.cli) provides the same functionality"
        ) from e

    from viewcrafter_tpu.pipeline import InferenceOptions, ViewCrafterPipeline

    opts = opts or InferenceOptions(mode="single_view_txt")
    pipeline = ViewCrafterPipeline(opts)

    def run(image, elevation, center_scale, d_phi, d_theta, d_r, steps, seed):
        import jax

        workdir = tempfile.mkdtemp(prefix="viewcrafter_")
        img_path = os.path.join(workdir, "input.png")
        from PIL import Image

        Image.fromarray(np.asarray(image)).save(img_path)
        traj_path = os.path.join(workdir, "traj.txt")
        with open(traj_path, "w") as f:
            f.write(f"0 {d_phi}\n0 {d_theta}\n0 {d_r}\n")

        pipeline.opts.image_dir = img_path
        pipeline.opts.out_dir = workdir
        pipeline.opts.exp_name = "gradio"
        pipeline.opts.traj_txt = traj_path
        pipeline.opts.elevation = float(elevation)
        pipeline.opts.center_scale = float(center_scale)
        pipeline.opts.ddim_steps = int(steps)
        pipeline.rng = jax.random.PRNGKey(int(seed))
        pipeline.run()
        save = pipeline.opts.save_dir

        def artifact(name):
            p = os.path.join(save, name)
            # io.save_video falls back to a PNG directory without ffmpeg
            return p if os.path.exists(p) else p + ".frames"

        return artifact("render0.mp4"), artifact("diffusion0.mp4")

    with gr.Blocks(title="ViewCrafter-TPU") as demo:
        gr.Markdown("# ViewCrafter-TPU — novel view synthesis from one image")
        with gr.Row():
            image = gr.Image(label="Input image")
            with gr.Column():
                elevation = gr.Slider(-45, 45, value=5, label="elevation")
                center_scale = gr.Slider(0.1, 2.0, value=1.0, label="center_scale")
                d_phi = gr.Slider(-45, 45, value=30, label="target d_phi")
                d_theta = gr.Slider(-40, 40, value=10, label="target d_theta")
                d_r = gr.Slider(-0.5, 0.5, value=-0.2, label="target d_r")
                steps = gr.Slider(1, 50, value=50, step=1, label="DDIM steps")
                seed = gr.Number(value=123, label="seed")
        btn = gr.Button("Generate")
        with gr.Row():
            render_out = gr.Video(label="rendered point cloud (guidance)")
            diffusion_out = gr.Video(label="generated video")
        btn.click(run, [image, elevation, center_scale, d_phi, d_theta, d_r, steps, seed],
                  [render_out, diffusion_out])
    return demo


if __name__ == "__main__":  # pragma: no cover
    build_demo().launch()
