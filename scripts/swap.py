#!/usr/bin/env python
"""Content/dynamics swap grid from a trained SRVP checkpoint.

The SRVP paper's disentanglement experiment (Figure 5: "content swap"):
the model factorizes each video into a static content variable `w` (plus
skip activations) and a dynamic trajectory `y_{1:T}`; decoding content
from video A with dynamics inferred from video B produces A's appearance
performing B's motion. The reference implementation has no tool for this —
its only checkpoint consumer is the metric protocol in
/root/reference/test.py — but its model factorization
(/root/reference/module/srvp.py:149-178) is what makes the swap
meaningful, so this ships as a first-class demo on top of the same
encode/infer/rollout/decode API the evaluator uses.

    python scripts/swap.py --xp_dir xp/kth --data_dir $DATA \
        [--n_videos 4] [--nt_gen 25] [--seed 0] \
        [--out swap.npz] [--gif GRID.gif]

Produces the full n x n grid in ONE batched decode: content index varies
along rows, dynamics along columns, so grid[i, i] is exactly the model's
ordinary prediction for video i (same RNG key derivation as
srvp.forward — the diagonal is bit-compatible with the standard path,
locked by tests/test_swap.py).

Output npz keys: `cond` (N, nt_cond, H, W, C) uint8 conditioning frames,
`gt` (N, nt_gen, ...) uint8, `grid` (N, N, nt_gen, H, W, C) uint8 with
axes (content, dynamics, time). --gif writes one animated tiled figure:
row i = content i, column j = dynamics j, conditioning sources framed
along the edges.
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
    p.add_argument("--n_videos", type=int, default=4,
                   help="grid side: n content sources x n dynamics sources")
    p.add_argument("--video_offset", type=int, default=0,
                   help="index of the first test video used")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="output npz (default: <xp_dir>/swap.npz)")
    p.add_argument("--gif", default=None,
                   help="also write one animated grid figure here")
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

    n = min(a.n_videos, len(testset) - a.video_offset)
    vids = np.stack([np.asarray(testset.get_item(a.video_offset + i))
                     for i in range(n)])
    if vids.ndim == 4:
        vids = vids[..., None]
    # (N, T, H, W, C) uint8 -> (T, N, H, W, C) float in [0, 1]
    x = np.transpose(vids, (1, 0, 2, 3, 4)).astype(np.float32) / 255.0
    x_cond = jnp.asarray(x[:nt_cond])

    # Content varies along rows, dynamics along columns: row-major raveled
    # pairs (i * n + j) -> content i, dynamics j. grid[i, i] reuses exactly
    # the (w_i, skips_i, y_i) triple srvp.forward would pair, and the key
    # split below matches forward's (srvp_tpu/models/srvp.py:436), so the
    # diagonal IS the standard prediction for --seed's base key.
    c_idx = np.repeat(np.arange(n), n)
    d_idx = np.tile(np.arange(n), n)

    @jax.jit
    def swap_grid(key):
        _, _, k_y, k_gen = jax.random.split(key, 4)
        hx, skips, _ = srvp.encode(cfg, params, bn_state, x_cond, train=False)
        hx32 = hx.astype(jnp.float32)
        w = srvp.infer_w(cfg, params, hx32, train=False)          # (N, nh)
        y_0, _ = srvp.infer_y(cfg, params, hx32[: cfg.nt_inf], k_y)
        gen = srvp.generate(cfg, params, y_0, hx32, nt_gen,
                            oversampling=o_gen, rng=k_gen, train=False)
        w_g = w[c_idx]                                            # (N*N, nh)
        y_g = gen.y[:, d_idx]                                     # (L, N*N, ny)
        skips_g = ([s[c_idx] for s in skips]
                   if skips is not None else None)
        x_, _ = srvp.decode(cfg, params, bn_state, w_g, y_g, skips_g,
                            train=False)
        return jnp.clip(x_, 0.0, 1.0)                             # (L, N*N, ...)

    out = np.asarray(swap_grid(jax.random.PRNGKey(a.seed)))
    # truncation, not rounding: matches eval_lib._to_u8 / the reference's
    # .mul(255).byte() so artifacts are byte-comparable with test.py's
    grid = (np.transpose(out, (1, 0, 2, 3, 4)) * 255).astype(np.uint8)
    grid = grid.reshape((n, n) + grid.shape[1:])   # (content, dynamics, T, ...)

    out_path = a.out or os.path.join(a.xp_dir, "swap.npz")
    np.savez_compressed(out_path, cond=vids[:, :nt_cond],
                        gt=vids[:, :nt_gen], grid=grid)
    print(f"wrote {out_path}: grid {grid.shape} (content, dynamics, t, ...)")

    if a.gif:
        from PIL import Image
        T, H, W, C = grid.shape[2:]
        pad = 2
        # (1+n) x (1+n) tiled figure: top row = dynamics sources (animated
        # ground truth), left column = content sources (frozen last
        # conditioning frame), body = the swap grid.
        rows, cols = n + 1, n + 1
        canvas = np.zeros((T, rows * (H + pad) - pad,
                           cols * (W + pad) - pad, C), np.uint8)

        def put(r, c, clip):
            canvas[:, r * (H + pad):r * (H + pad) + H,
                   c * (W + pad):c * (W + pad) + W] = clip

        frozen = vids[:, nt_cond - 1]  # last conditioning frame per video
        for j in range(n):
            put(0, j + 1, vids[j, :nt_gen] if vids.shape[1] >= nt_gen
                else vids[j, -1][None])
        for i in range(n):
            put(i + 1, 0, frozen[i][None])
        for i in range(n):
            for j in range(n):
                put(i + 1, j + 1, grid[i, j])
        frames = [Image.fromarray(f.squeeze(-1) if C == 1 else f)
                  for f in canvas]
        frames[0].save(a.gif, save_all=True, append_images=frames[1:],
                       duration=int(1000 / a.fps), loop=0)
        print(f"wrote {a.gif}: {rows}x{cols} tiles, {T} frames "
              f"(top row = dynamics sources, left column = content sources)")


if __name__ == "__main__":
    main()
