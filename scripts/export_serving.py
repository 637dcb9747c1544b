#!/usr/bin/env python
"""Export a trained SRVP checkpoint as a self-contained serving artifact.

The deployment step the reference lacks (its checkpoints are only consumed
by the torch test protocol, /root/reference/test.py:196-204): lowers the
generation function to versioned StableHLO via jax.export with the trained
weights baked in — one portable file, batch-polymorphic, runnable on TPU
and CPU without the model code or checkpoint (srvp_tpu/export.py has the
format and calling convention).

    python scripts/export_serving.py --xp_dir xp/smmnist \
        [--model_name model_best.npz|model.pt] [--nt_cond 5] [--nt_gen 25] \
        [--platforms tpu cpu] [--batch_size N] [--out serving.srvpexp] \
        [--selfcheck]

--selfcheck reloads the written artifact and runs one batch on the current
platform, printing the output shape (fails loudly if the artifact cannot
serve where the export ran).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--xp_dir", required=True)
    p.add_argument("--model_name", default="model_best.npz",
                   help=".npz native or .pt (converted on the fly)")
    p.add_argument("--nt_cond", type=int, default=None)
    p.add_argument("--nt_gen", type=int, default=None,
                   help="total frames incl. conditioning (default: config's "
                        "seq_len_test, else seq_len)")
    p.add_argument("--n_euler_steps", type=int, default=None)
    p.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    p.add_argument("--batch_size", type=int, default=None,
                   help="pin the batch dimension (default: symbolic — one "
                        "artifact serves any batch size)")
    p.add_argument("--out", default=None,
                   help="output path (default: <xp_dir>/serving.srvpexp)")
    p.add_argument("--selfcheck", action="store_true")
    a = p.parse_args()

    from srvp_tpu import export as ex
    from srvp_tpu.utils.runtime import setup_compilation_cache
    setup_compilation_cache()

    out = ex.export_from_xp_dir(
        a.xp_dir, model_name=a.model_name, nt_cond=a.nt_cond,
        nt_gen=a.nt_gen, oversampling=a.n_euler_steps,
        platforms=tuple(a.platforms), batch_size=a.batch_size, out=a.out)
    print(f"Wrote {out} ({os.path.getsize(out)} bytes)")

    if a.selfcheck:
        import numpy as np
        fn, hdr = ex.load_serving(out)
        b = hdr["batch"] if isinstance(hdr["batch"], int) else 2
        x = np.zeros((hdr["nt_cond"], b, hdr["nx"], hdr["nx"], hdr["nc"]),
                     dtype=np.uint8)
        y = np.asarray(fn(x, 0))
        assert y.shape == (hdr["nt_gen"], b, hdr["nx"], hdr["nx"], hdr["nc"])
        print(f"Selfcheck ok: f(({hdr['nt_cond']}, {b}, ...) uint8) -> "
              f"{y.shape} {y.dtype}")


if __name__ == "__main__":
    main()
