"""Gradio demo smoke test (reference gradio_app.py:19-91 parity).

gradio isn't installed in this environment, so a minimal stub that records
the component wiring stands in for it; the demo's `run` callback is then
executed for real on the tiny presets — the same upload->trajectory->render->
diffuse path the reference demo drives.
"""

import os
import sys
import types

import numpy as np
import pytest


class _Component:
    def __init__(self, *a, **k):
        self.label = k.get("label")

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _Button(_Component):
    clicks = []

    def click(self, fn, inputs, outputs):
        _Button.clicks.append((fn, inputs, outputs))


class _Examples(_Component):
    seen = []

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        _Examples.seen.append(k.get("examples"))


def _install_fake_gradio(monkeypatch):
    gr = types.ModuleType("gradio")
    for name in ("Blocks", "Markdown", "Row", "Column", "Image", "Slider",
                 "Number", "Video", "Text"):
        setattr(gr, name, _Component)
    gr.Button = _Button
    gr.Examples = _Examples
    monkeypatch.setitem(sys.modules, "gradio", gr)
    _Button.clicks = []
    _Examples.seen = []


def test_app_builds_and_generates(monkeypatch, tmp_path):
    _install_fake_gradio(monkeypatch)

    from viewcrafter_tpu.app import build_demo
    from viewcrafter_tpu.pipeline import InferenceOptions
    from tests.test_pipeline import TINY_DUST3R

    opts = InferenceOptions(
        out_dir=str(tmp_path),
        mode="single_view_txt",
        model="viewcrafter_tiny",
        ddim_steps=2,
        video_length=4,
        dust3r_size=64,
        dust3r_model="dust3r_tiny",
        niter=5,
        batch_size=2,
    )
    # build_demo creates the pipeline from opts; shrink dust3r for test speed
    from viewcrafter_tpu.pipeline import ViewCrafterPipeline as _VP

    orig_init = _VP.__init__

    def patched_init(self, o, **kw):
        kw.setdefault("dust3r_cfg", TINY_DUST3R)
        orig_init(self, o, **kw)

    monkeypatch.setattr(_VP, "__init__", patched_init)

    demo = build_demo(opts)
    assert demo is not None
    assert len(_Button.clicks) == 1
    run_fn, inputs, outputs = _Button.clicks[0]
    assert len(inputs) == 8 and len(outputs) == 2

    # examples gallery mirrors reference gradio_app.py:8-14 (bundled images)
    assert _Examples.seen and len(_Examples.seen[0]) == 5
    assert all(os.path.exists(e[0]) for e in _Examples.seen[0])

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    img[30:60, 40:90] = [200, 50, 50]
    # free-form 3-waypoint sequences, like the reference's text inputs
    traj_path, diffusion_path = run_fn(
        img, 5.0, 1.0, "0 5 10", "0 -2 4", "0 -0.05 -0.1", 2, 123)
    assert os.path.basename(traj_path).startswith("viz_traj")
    assert os.path.exists(traj_path), traj_path
    assert os.path.exists(diffusion_path), diffusion_path
