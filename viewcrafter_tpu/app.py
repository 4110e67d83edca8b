"""Gradio web demo (single_view_txt mode), mirroring the reference app
(gradio_app.py:19-91 + viewcrafter.py:436-462): upload one image, set
elevation / center_scale and free-form d_phi / d_theta / d_r *sequences*
(text boxes, like the reference's `i2v_d_phi` etc.), get the camera
trajectory visualization video and the diffused novel-view video.

Gradio isn't bundled in every environment; the import is deferred so the rest
of the framework never depends on it.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

# reference gradio_app.py:8-14 i2v_examples (same images, bundled in test/images)
_EXAMPLES = [
    ["test/images/boy.png", 0, 1.0, "0 40", "0 0", "0 0", 50, 123],
    ["test/images/car.jpg", 0, 1.0, "0 -35", "0 0", "0 -0.1", 50, 123],
    ["test/images/fruit.png", 0, 1.0, "0 -3 -15 -20 -17 -5 0",
     "0 -2 -5 -10 -8 -5 0 2 5 3 0", "0 0", 50, 123],
    ["test/images/room.png", 10, 1.0, "0 3 10 20 17 10 0",
     "0 -2 -8 -6 0 2 5 3 0", "0 -0.02 -0.09 -0.16 -0.09 0", 50, 123],
    ["test/images/castle.png", 0, 1.0, "0 30",
     "0 -1 -5 -4 0 1 5 4 0", "0 -0.2", 50, 123],
]


def _parse_seq(text, name: str) -> list:
    """'0 -3 -15' -> [0.0, -3.0, -15.0] (reference viewcrafter.py:439 split)."""
    vals = [float(v) for v in str(text).split()]
    if not vals:
        raise ValueError(f"{name} sequence is empty; it should start with 0")
    return vals


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

        if isinstance(image, str):  # examples pass a path
            Image.open(image).convert("RGB").save(img_path)
        else:
            Image.fromarray(np.asarray(image)).save(img_path)
        # one line per axis, exactly the single_view_txt trajectory file format
        # (reference configs/infer_config.py traj_txt; pipeline.py parses the
        # same three lines)
        phis = _parse_seq(d_phi, "d_phi")
        thetas = _parse_seq(d_theta, "d_theta")
        rs = _parse_seq(d_r, "d_r")
        traj_path = os.path.join(workdir, "traj.txt")
        with open(traj_path, "w") as f:
            f.write(" ".join(map(str, phis)) + "\n")
            f.write(" ".join(map(str, thetas)) + "\n")
            f.write(" ".join(map(str, rs)) + "\n")

        pipeline.opts.image_dir = img_path
        pipeline.opts.out_dir = workdir
        pipeline.opts.exp_name = "gradio"
        pipeline.opts.mode = "single_view_txt"
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

        # reference run_gradio returns (viz_traj.mp4, diffusion0.mp4)
        # (viewcrafter.py:458-462)
        return artifact("viz_traj.mp4"), artifact("diffusion0.mp4")

    with gr.Blocks(title="ViewCrafter-TPU") as demo:
        gr.Markdown("# ViewCrafter-TPU — novel view synthesis from one image")
        with gr.Row():
            with gr.Column():
                image = gr.Image(label="Input Image")
                elevation = gr.Slider(-45, 45, value=5, step=1, label="elevation")
                center_scale = gr.Slider(0.1, 2.0, value=1.0, step=0.1,
                                         label="center_scale")
                d_phi = gr.Text(label="d_phi sequence, should start with 0")
                d_theta = gr.Text(label="d_theta sequence, should start with 0")
                d_r = gr.Text(label="d_r sequence, should start with 0")
                steps = gr.Slider(1, 50, value=50, step=1, label="Sampling steps")
                seed = gr.Slider(0, 2 ** 31, value=123, step=1, label="Random Seed")
                btn = gr.Button("Generate")
            with gr.Column():
                traj_out = gr.Video(label="Camera Trajectory")
                diffusion_out = gr.Video(label="Generated Video")
        inputs = [image, elevation, center_scale, d_phi, d_theta, d_r, steps, seed]
        outputs = [traj_out, diffusion_out]
        if hasattr(gr, "Examples"):
            root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            examples = [
                [os.path.join(root, e[0])] + e[1:]
                for e in _EXAMPLES
                if os.path.exists(os.path.join(root, e[0]))
            ]
            if examples:
                gr.Examples(examples=examples, inputs=inputs, outputs=outputs,
                            fn=run, cache_examples=False)
        btn.click(run, inputs, outputs)
    return demo


if __name__ == "__main__":  # pragma: no cover
    build_demo().launch()
