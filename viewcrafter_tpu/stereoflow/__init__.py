"""Stereo/flow downstream evaluation suite (CroCo-Stereo / CroCo-Flow).

JAX port of extern/dust3r/croco/stereoflow/: losses + metrics (criterion.py),
tiled overlapping-crop inference (engine.py tiled_pred), and a training step.
Unused by the ViewCrafter video pipeline itself, but part of the reference's
surface for the downstream stereo/flow checkpoints.
"""

from viewcrafter_tpu.stereoflow.criterion import (  # noqa: F401
    FlowDatasetMetrics,
    StereoDatasetMetrics,
    flow_metrics,
    l1_loss,
    laplacian_loss,
    laplacian_loss_bounded,
    laplacian_loss_bounded2,
    stereo_metrics,
)
from viewcrafter_tpu.stereoflow.engine import tiled_pred, train_step  # noqa: F401
