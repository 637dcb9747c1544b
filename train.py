#!/usr/bin/env python
"""SRVP training CLI (TPU). Drop-in flag parity with the reference train.py:

    python train.py --save_path xp/smmnist --dataset smmnist --data_dir $DATA \
        --ny 20 --nz 20 --beta_z 2 --nt_cond 5 --nt_inf 5 --nc 1 --seq_len 15

No torch.distributed.launch equivalent is needed: one process drives all TPU
chips through a jax.sharding.Mesh (see srvp_tpu/parallel/mesh.py).
"""

from srvp_tpu import args
from srvp_tpu.helper import DotDict
from srvp_tpu.train_main import main

if __name__ == "__main__":
    p = args.create_args()
    opt = DotDict(vars(p.parse_args()))
    raise SystemExit(main(opt))
