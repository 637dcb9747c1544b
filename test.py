#!/usr/bin/env python
"""SRVP evaluation CLI (TPU). Drop-in flag parity with the reference test.py
(/root/reference/test.py:322-359): loads config.json + a checkpoint from
--xp_dir, runs best/worst-of-N stochastic prediction with PSNR/SSIM/LPIPS
(and optional FVD), prints mean ± 95% CI and saves npz artifacts.

Checkpoints: srvp_tpu .npz snapshots by default; a --model_name ending in
.pt is converted from the reference's PyTorch format on the fly.
"""

import os

import numpy as np

import jax

from srvp_tpu import configlib
from srvp_tpu import eval_lib
from srvp_tpu.data.base import load_dataset
from srvp_tpu.data.loader import DataLoader
from srvp_tpu.helper import DotDict, load_json
from srvp_tpu.models import srvp
from srvp_tpu.train_main import model_config
from srvp_tpu.utils import checkpoint as ckpt


def create_test_args():
    p = configlib.ArgumentParser(
        prog="Stochastic Latent Residual Video Prediction (testing, TPU)",
        description="Evaluates a trained SRVP model: PSNR, SSIM, LPIPS and FVD; "
                    "saves best/worst/random prediction npz artifacts.")
    p.add("--xp_dir", type=str, metavar="DIR", required=True,
          help="Directory with the model checkpoint and its config.json.")
    p.add("--data_dir", type=str, metavar="DIR", required=True,
          help="Directory where the dataset is saved.")
    p.add("--lpips_dir", type=str, metavar="DIR", default=None,
          help="Directory with LPIPS v0.1 weights (alex.pth). If omitted, "
               "LPIPS is skipped.")
    p.add("--n_euler_steps", type=int, metavar="STEPS", default=None,
          help="Euler steps per frame for prediction (default: training value).")
    p.add("--nt_cond", type=int, metavar="COND", default=None,
          help="Number of conditioning frames.")
    p.add("--nt_gen", type=int, metavar="GEN", default=None,
          help="Total number of frames (conditioning + predicted). Defaults "
               "to the config's seq_len_test, else 25 (the reference "
               "test.py default, /root/reference/test.py:337-338).")
    p.add("--batch_size", type=int, metavar="BATCH", default=16,
          help="Batch size used to compute metrics.")
    p.add("--n_samples", type=int, metavar="NB_SAMPLES", default=100,
          help="Number of predictions per sequence for best-of-N metrics.")
    p.add("--model_name", type=str, metavar="FILE", default="model.npz",
          help="Checkpoint file in xp_dir (.npz native, .pt converted).")
    p.add("--device", type=int, metavar="DEVICE", default=None,
          help="Accepted for compatibility; TPU devices are auto-detected.")
    p.add("--n_devices", type=int, metavar="NB", default=None,
          help="Number of devices to shard evaluation over (default: all). "
               "The video batch is sharded over the mesh; results are "
               "identical to single-device evaluation.")
    p.add("--fvd", action="store_true", help="Whether to compute FVD.")
    p.add("--test_seed", type=int, metavar="SEED", default=1, help="Manual seed.")
    p.add("--samples_chunk", type=int, metavar="NB", default=10,
          help="Samples evaluated per jit-compiled chunk.")
    p.add("--fused_rollout", type=str, default="auto",
          choices=["auto", "on", "off"],
          help="Use the weights-stationary Pallas kernel for the prior "
               "rollout (auto: on TPU backends only).")
    return p


def resolve_nt_test(opt, xp_config):
    """Protocol default chain: CLI --nt_gen > config seq_len_test > 25
    (the reference defaults nt_gen to 25, /root/reference/test.py:337-338)."""
    nt_test = opt.nt_gen if opt.nt_gen is not None else \
        xp_config.get("seq_len_test")
    return 25 if nt_test is None else nt_test


def main(opt):
    from srvp_tpu.utils.runtime import setup_compilation_cache
    setup_compilation_cache()
    # ----- experiment config (reference test.py:174-181) -----
    xp_config = load_json(os.path.join(opt.xp_dir, "config.json"))
    nt_cond = opt.nt_cond if opt.nt_cond is not None else xp_config.nt_cond
    nt_test = resolve_nt_test(opt, xp_config)
    o_inf = xp_config.n_euler_steps
    o_gen = opt.n_euler_steps if opt.n_euler_steps is not None else o_inf

    # ----- data (reference test.py:185-191) -----
    print("Loading data...")
    xp_config.data_dir = opt.data_dir
    xp_config.seq_len = nt_test
    dataset = load_dataset(xp_config, train=False)
    testset = dataset.get_fold("test")
    loader = DataLoader(testset, opt.batch_size, shuffle=False, drop_last=False,
                        num_workers=4)

    # ----- model (reference test.py:196-204) -----
    print("Loading model...")
    cfg = model_config(xp_config)
    model_path = os.path.join(opt.xp_dir, opt.model_name)
    if opt.model_name.endswith(".pt"):
        from srvp_tpu.utils.torch_convert import load_torch_checkpoint
        params, bn_state = load_torch_checkpoint(model_path, cfg)
    else:
        tmpl_p, tmpl_s = srvp.init(jax.random.PRNGKey(0), cfg)
        params, bn_state = ckpt.load_model(model_path, tmpl_p, tmpl_s)

    # ----- LPIPS (optional; reference requires it, test.py:172) -----
    lpips_fn = None
    if opt.lpips_dir:
        from srvp_tpu.metrics.lpips import make_video_lpips
        lpips_fn = make_video_lpips(opt.lpips_dir)
    metric_names = ["psnr", "ssim"] + (["lpips"] if lpips_fn else [])

    # Fail fast on missing I3D weights BEFORE the (long) sampling loop.
    if opt.fvd:
        from srvp_tpu.metrics.fvd import default_i3d_path
        i3d_path = default_i3d_path()
        if not os.path.exists(i3d_path):
            raise FileNotFoundError(
                f"--fvd requires I3D weights at {i3d_path} "
                "(see scripts/convert_i3d.py / SRVP_TPU_I3D_WEIGHTS)")

    # ----- evaluation -----
    print("Evaluation...")
    fused = opt.get("fused_rollout", "auto") if hasattr(opt, "get") else "auto"
    use_fused = (jax.default_backend() == "tpu") if fused == "auto" else fused == "on"
    select_chunk = eval_lib.make_select_chunk(cfg, nt_cond, nt_test, o_inf,
                                              o_gen, metric_names,
                                              lpips_fn=lpips_fn,
                                              use_fused_rollout=use_fused)
    # Shard the video batch over the device mesh; edge-pad ragged batches to
    # --batch_size so one program is compiled per shape and every batch
    # divides the mesh (padded videos are dropped on the host).
    from srvp_tpu.parallel import make_mesh
    if opt.get("n_devices") is not None:
        assert opt.batch_size % opt.n_devices == 0, \
            "--n_devices must divide --batch_size"
        mesh = make_mesh(opt.n_devices)
    else:
        # default: the largest device count that divides the batch
        n = len(jax.devices())
        while opt.batch_size % n:
            n -= 1
        mesh = make_mesh(n)
    results, samples, cond, gt = eval_lib.run_test_device(
        select_chunk, params, bn_state, iter(loader), nt_cond, nt_test,
        opt.n_samples, opt.samples_chunk, jax.random.PRNGKey(opt.test_seed),
        metric_names, (cfg.nx, cfg.nx, cfg.nc), mesh=mesh,
        pad_to=opt.batch_size)

    # ----- FVD (reference test.py:295-302) -----
    fvd_value = None
    if opt.fvd:
        from srvp_tpu.metrics.fvd import fvd as fvd_score
        ref_vids = np.concatenate([cond, gt], axis=1)
        hyp_vids = np.concatenate([cond, samples["random_1"]], axis=1)
        fvd_value = fvd_score(ref_vids, hyp_vids)

    # ----- results (reference test.py:307-319) -----
    print("\n")
    print("Results:")
    for name, res in results.items():
        print(name, res.mean(), "+/-", 1.960 * res.std() / np.sqrt(len(res)))
    if fvd_value is not None:
        print("FVD", fvd_value)

    np.savez_compressed(os.path.join(opt.xp_dir, "results.npz"), **results)
    for name, res in samples.items():
        np.savez_compressed(os.path.join(opt.xp_dir, f"{name}.npz"), samples=res)


if __name__ == "__main__":
    opt = DotDict(vars(create_test_args().parse_args()))
    main(opt)
