#!/usr/bin/env python
"""Conditional video generation from a trained SRVP checkpoint.

A lightweight serving-style tool on top of the training/eval stack (the
reference has no equivalent; its only consumer of checkpoints is the metric
protocol in /root/reference/test.py). Loads config.json + a checkpoint from
--xp_dir exactly like test.py, conditions on the first nt_cond frames of
test-set videos, and writes sampled futures:

    python scripts/generate.py --xp_dir xp/smmnist --data_dir $DATA \
        [--nt_gen 25] [--n_samples 5] [--n_videos 8] [--seed 0] \
        [--out samples.npz] [--gif_dir gifs/]

Output npz keys: `cond` (N, nt_cond, H, W, C) uint8, `gt` (N, nt_gen, ...)
uint8, `samples` (S, N, nt_gen, H, W, C) uint8 — each sample covers the
full horizon (reconstructed conditioning frames + prediction), matching the
reference protocol's frame indexing. --gif_dir additionally writes one
animated GIF per (video, sample) via PIL.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--xp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--model_name", default="model.npz",
                   help=".npz native or .pt (converted on the fly)")
    p.add_argument("--nt_cond", type=int, default=None)
    p.add_argument("--nt_gen", type=int, default=None,
                   help="total frames incl. conditioning (default: config's "
                        "seq_len_test, else 25)")
    p.add_argument("--n_euler_steps", type=int, default=None)
    p.add_argument("--n_samples", type=int, default=5)
    p.add_argument("--n_videos", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="output npz (default: <xp_dir>/samples.npz)")
    p.add_argument("--gif_dir", default=None,
                   help="also write per-(video, sample) animated GIFs here")
    p.add_argument("--fps", type=float, default=4.0, help="GIF frame rate")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    from srvp_tpu.data.base import load_dataset
    from srvp_tpu.helper import load_json
    from srvp_tpu.models import srvp
    from srvp_tpu.train_main import model_config
    from srvp_tpu.utils import checkpoint as ckpt
    from srvp_tpu.utils.runtime import setup_compilation_cache
    setup_compilation_cache()

    xp_config = load_json(os.path.join(a.xp_dir, "config.json"))
    nt_cond = a.nt_cond if a.nt_cond is not None else xp_config.nt_cond
    nt_gen = a.nt_gen or xp_config.get("seq_len_test") or 25
    o_gen = a.n_euler_steps if a.n_euler_steps is not None \
        else xp_config.n_euler_steps

    xp_config.data_dir = a.data_dir
    xp_config.seq_len = nt_gen
    testset = load_dataset(xp_config, train=False).get_fold("test")

    cfg = model_config(xp_config)
    model_path = os.path.join(a.xp_dir, a.model_name)
    if a.model_name.endswith(".pt"):
        from srvp_tpu.utils.torch_convert import load_torch_checkpoint
        params, bn_state = load_torch_checkpoint(model_path, cfg)
    else:
        tmpl_p, tmpl_s = srvp.init(jax.random.PRNGKey(0), cfg)
        params, bn_state = ckpt.load_model(model_path, tmpl_p, tmpl_s)

    n = min(a.n_videos, len(testset))
    vids = np.stack([np.asarray(testset.get_item(i)) for i in range(n)])
    # (N, T, H, W[, C]) uint8 -> (T, N, H, W, C) float in [0, 1]
    if vids.ndim == 4:
        vids = vids[..., None]
    x = np.transpose(vids, (1, 0, 2, 3, 4)).astype(np.float32) / 255.0
    x_cond = jnp.asarray(x[:nt_cond])

    @jax.jit
    def sample(key):
        out = srvp.forward(cfg, params, bn_state, x_cond, nt_gen,
                           oversampling=o_gen, rng=key, train=False)
        return jnp.clip(out.x_, 0.0, 1.0)

    key = jax.random.PRNGKey(a.seed)
    samples = np.stack([
        np.asarray(sample(jax.random.fold_in(key, s)))
        for s in range(a.n_samples)])                 # (S, T, N, H, W, C)
    # truncation, not rounding: matches eval_lib._to_u8 / the reference's
    # .mul(255).byte() so artifacts are byte-identical with test.py's
    samples_u8 = np.transpose(
        (samples * 255).astype(np.uint8), (0, 2, 1, 3, 4, 5))

    out_path = a.out or os.path.join(a.xp_dir, "samples.npz")
    np.savez_compressed(
        out_path,
        cond=vids[:, :nt_cond],
        gt=vids[:, :nt_gen],
        samples=samples_u8)
    print(f"wrote {out_path}: cond {vids[:, :nt_cond].shape}, "
          f"samples {samples_u8.shape}")

    if a.gif_dir:
        from PIL import Image
        os.makedirs(a.gif_dir, exist_ok=True)
        dur = int(1000 / a.fps)
        for v in range(n):
            for s in range(a.n_samples):
                frames = [Image.fromarray(f.squeeze(-1) if f.shape[-1] == 1
                                          else f)
                          for f in samples_u8[s, v]]
                gp = os.path.join(a.gif_dir, f"video{v}_sample{s}.gif")
                frames[0].save(gp, save_all=True, append_images=frames[1:],
                               duration=dur, loop=0)
        print(f"wrote {n * a.n_samples} GIFs to {a.gif_dir}")


if __name__ == "__main__":
    main()
