#!/usr/bin/env python
"""Converts a reference PyTorch SRVP checkpoint (.pt) to srvp-tpu .npz format.

    python scripts/convert_checkpoint.py --pt model.pt --config config.json \
        --out model.npz

After conversion, `test.py --model_name model.npz` evaluates the released
pretrained models (or pass --model_name model.pt to convert on the fly).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srvp_tpu.helper import load_json
from srvp_tpu.train_main import model_config
from srvp_tpu.utils.serialization import save_npz
from srvp_tpu.utils.torch_convert import load_torch_checkpoint


def main(args):
    xp_config = load_json(args.config)
    cfg = model_config(xp_config)
    params, bn_state = load_torch_checkpoint(args.pt, cfg)
    save_npz(args.out, {"params": params, "bn_state": bn_state})
    print(f"converted {args.pt} -> {args.out} (archi={cfg.archi}, "
          f"ny={cfg.ny}, nz={cfg.nz}, skipco={cfg.skipco})")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pt", required=True, help="Reference .pt checkpoint")
    p.add_argument("--config", required=True, help="Experiment config.json")
    p.add_argument("--out", required=True, help="Output .npz path")
    main(p.parse_args())
