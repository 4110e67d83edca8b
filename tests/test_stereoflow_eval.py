"""End-to-end stereoflow eval CLI round-trip (reference test.py protocol):
save a tiny checkpoint, build fake dataset trees in a tmp dir, run the CLI
main(), and check metrics/pred/visu/err10/submission artifacts."""

import json
import os
import os.path as osp
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

TINY_CROCO = dict(
    img_size=(32, 64), patch_size=16, enc_embed_dim=32, enc_depth=2,
    enc_num_heads=2, dec_embed_dim=32, dec_depth=8, dec_num_heads=2,
    dpt_layer_dims=(8, 16, 24, 32), dpt_feature_dim=16,
    dpt_last_dim=8, hooks_idx=(1, 4, 7, 9),
)


def _save_tiny_ckpt(tmp_path, task):
    from viewcrafter_tpu.models.croco_downstream import (
        CroCoDownstreamBinocular,
        CroCoDownstreamConfig,
    )
    from viewcrafter_tpu.utils.checkpoint import save_params

    nch = {"stereo": 1, "flow": 2}[task] + 1
    cfg = CroCoDownstreamConfig(num_channels=nch, **TINY_CROCO)
    model = CroCoDownstreamBinocular(cfg=cfg)
    z = jnp.zeros((1, 32, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), z, z)
    path = osp.join(tmp_path, f"ckpt_{task}")
    save_params(path, params)
    with open(path + ".json", "w") as fid:
        json.dump({"task": task, "with_conf": True, "crop": [32, 64],
                   "tile_conf_mode": "conf_expsigmoid_10_5",
                   "croco": {k: list(v) if isinstance(v, tuple) else v
                              for k, v in TINY_CROCO.items()}}, fid)
    return path


def _png(path, h=48, w=96, seed=0):
    os.makedirs(osp.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


def test_eval_cli_stereo_eth3d_submission(tmp_path, monkeypatch):
    """ETH3D train split: metrics + pred + visu + err10 + PFM submission zip."""
    from viewcrafter_tpu.stereoflow.data import write_pfm
    from viewcrafter_tpu.stereoflow import eval as sfeval

    tmp_path = str(tmp_path)
    root = osp.join(tmp_path, "stereoflow", "eth3d_lowres")
    _png(osp.join(root, "train", "sceneA", "im0.png"))
    _png(osp.join(root, "train", "sceneA", "im1.png"), seed=1)
    os.makedirs(osp.join(root, "test"), exist_ok=True)
    gt = np.abs(np.random.default_rng(2).normal(2.0, 1.0, (48, 96))).astype(np.float32)
    os.makedirs(osp.join(root, "train_gt", "sceneA"), exist_ok=True)
    write_pfm(osp.join(root, "train_gt", "sceneA", "disp0GT.pfm"), gt)
    monkeypatch.setattr("viewcrafter_tpu.stereoflow.data.STEREOFLOW_ROOT",
                        osp.join(tmp_path, "stereoflow"))

    model_path = _save_tiny_ckpt(tmp_path, "stereo")
    outdir = osp.join(tmp_path, "out")
    args = sfeval.get_args_parser().parse_args([
        "--model", model_path, "--dataset", "ETH3DLowRes('train')",
        "--save", "metrics", "pred", "visu", "err10", "submission",
        "--tile_overlap", "0.7", "--out_dir", outdir,
    ])
    results = sfeval.main(args)

    # metrics json + values
    (key,) = results.keys()
    assert "L1err" in results[key] and np.isfinite(results[key]["L1err"])
    mfiles = [f for f in os.listdir(outdir) if f.endswith(".json")]
    assert len(mfiles) == 1
    # per-pair artifacts
    assert osp.isfile(osp.join(outdir, "train", "sceneA_pred.npy"))
    assert osp.isfile(osp.join(outdir, "train", "sceneA_pred.png"))
    assert osp.isfile(osp.join(outdir, "train", "sceneA_err10.png"))
    pred = np.load(osp.join(outdir, "train", "sceneA_pred.npy"))
    assert pred.shape == (48, 96, 1) and np.isfinite(pred).all()
    # submission: PFM + runtime sidecar, zipped (datasets_stereo.py:384-394)
    sub = osp.join(outdir, "submission_conf_conf_expsigmoid_10_5_overlap_0.7")
    assert osp.isfile(osp.join(sub, "low_res_two_view", "sceneA.pfm"))
    runtime = open(osp.join(sub, "low_res_two_view", "sceneA.txt")).read()
    assert runtime.startswith("runtime ")
    zpath = osp.join(sub, "eth3d_low_res_two_view_results.zip")
    assert osp.isfile(zpath)
    with zipfile.ZipFile(zpath) as zf:
        assert "low_res_two_view/sceneA.pfm" in zf.namelist()


def test_eval_cli_flow_sintel_submission(tmp_path, monkeypatch):
    """MPI-Sintel test_allpass: .flo submission files for clean+final."""
    from viewcrafter_tpu.stereoflow.data import read_flo
    from viewcrafter_tpu.stereoflow import eval as sfeval

    tmp_path = str(tmp_path)
    root = osp.join(tmp_path, "stereoflow", "MPI-Sintel")
    for pas in ("clean", "final"):
        for i in (1, 2):
            _png(osp.join(root, "test", pas, "seq_1", f"frame_{i:04d}.png"), seed=i)
    monkeypatch.setattr("viewcrafter_tpu.stereoflow.data.STEREOFLOW_ROOT",
                        osp.join(tmp_path, "stereoflow"))

    model_path = _save_tiny_ckpt(tmp_path, "flow")
    outdir = osp.join(tmp_path, "out_flow")
    args = sfeval.get_args_parser().parse_args([
        "--model", model_path, "--dataset", "MPISintel('test_allpass')",
        "--save", "submission", "--out_dir", outdir,
    ])
    sfeval.main(args)

    sub = osp.join(outdir, "submission_conf_conf_expsigmoid_10_5_overlap_0.7",
                   "submission")
    for pas in ("clean", "final"):
        flo = osp.join(sub, "test", pas, "seq_1", "frame_0001.flo")
        assert osp.isfile(flo), flo
        flow = read_flo(flo)
        assert flow.shape == (48, 96, 2) and np.isfinite(flow).all()


def test_submission_writers_kitti_mdeval3(tmp_path):
    """Direct unit coverage of the remaining writers: KITTI PNG encodings and
    MdEval3 PFM layout + zip."""
    from viewcrafter_tpu.stereoflow.data import (
        Kitti12Stereo, Kitti15Stereo, Kitti12Flow, Kitti15Flow, MdEval3,
        read_kitti_disp, read_kitti_flow,
    )

    tmp_path = str(tmp_path)
    disp = np.abs(np.random.default_rng(0).normal(20, 5, (8, 16))).astype(np.float32)
    flow = np.random.default_rng(1).normal(0, 3, (8, 16, 2)).astype(np.float32)

    # stereo PNGs round-trip through the KITTI uint16*256 encoding
    for cls, name in ((Kitti12Stereo, "000005_10.png"),
                      (Kitti15Stereo, osp.join("disp_0", "000005_10.png"))):
        d = osp.join(tmp_path, cls.__name__)
        cls.submission_save_pairname(
            object.__new__(cls), "testing/x/000005", disp, d, 0.1)
        got = read_kitti_disp(osp.join(d, name))
        np.testing.assert_allclose(got, disp, atol=1 / 256.0)

    # flow PNGs round-trip through the KITTI (uv*64+2^15, valid) encoding
    for cls, name in ((Kitti12Flow, "000005_10.png"),
                      (Kitti15Flow, osp.join("flow", "000005_10.png"))):
        d = osp.join(tmp_path, cls.__name__)
        cls.submission_save_pairname(
            object.__new__(cls), "testing/x/000005", flow, d, 0.1)
        got = read_kitti_flow(osp.join(d, name))
        np.testing.assert_allclose(got[..., :2], flow, atol=1 / 64.0)

    # MdEval3: training<res>/<seq>/disp0<method>.pfm + time file + zip
    md = object.__new__(MdEval3)
    md.submission_sresolution = "H"
    md.split = "test_half"
    d = osp.join(tmp_path, "mdeval3")
    md.submission_save_pairname("train/Pipes", disp, d, 0.25)
    pfm = osp.join(d, "trainingH", "Pipes", "disp0CroCo-Stereo.pfm")
    assert osp.isfile(pfm)
    assert open(osp.join(d, "trainingH", "Pipes", "timeCroCo-Stereo.txt")).read() == "0.25"
    md.finalize_submission(d)
    with zipfile.ZipFile(osp.join(d, "CroCo-Stereo.zip")) as zf:
        assert "trainingH/Pipes/disp0CroCo-Stereo.pfm" in zf.namelist()
