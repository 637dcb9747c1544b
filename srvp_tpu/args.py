"""Training CLI flags — name-for-name parity with the reference plus TPU extras.

Reference flag surface: /root/reference/args.py:28-165. Every reference flag
is accepted with the same name, type, default and semantics. GPU/AMP-specific
flags are kept for drop-in compatibility but map onto their TPU equivalents
(bf16 compute; SPMD over a device mesh instead of NCCL process groups).
"""

from srvp_tpu import configlib

ARCH_TYPES = ["dcgan", "vgg"]
DATASETS = ["smmnist", "kth", "human", "bair"]
PRECISIONS = ["float32", "bfloat16"]


def _nonneg_int(value):
    i = int(value)
    if i < 0:
        raise ValueError(f"must be >= 0, got {value}")
    return i


def create_args():
    p = configlib.ArgumentParser(
        prog="Stochastic Latent Residual Video Prediction (training, TPU)",
        description="Trains SRVP with the given parameters on TPU (JAX/XLA).",
    )

    p.add("--seed", type=int, metavar="SEED", default=None,
          help="Manual seed. If None, it is chosen randomly.")
    p.add("--save_path", type=str, metavar="PATH", required=True,
          help="Path where models should be saved.")

    # Mixed precision (reference args.py:49-65). On TPU bf16 is native MXU
    # dtype; no loss scaling is needed, so both legacy flags enable bf16.
    amp_p = p.add_argument_group(
        title="Mixed precision",
        description="TPU bf16 compute. Legacy torch/apex flags map to bf16.")
    amp_p.add("--precision", type=str, default="float32", choices=PRECISIONS,
              help="Compute dtype for conv encoder/decoder (latents stay fp32).")
    amp_mex = amp_p.add_mutually_exclusive_group()
    amp_mex.add("--torch_amp", action="store_true",
                help="Legacy alias: enables bfloat16 compute.")
    amp_mex.add("--apex_amp", action="store_true",
                help="Legacy alias: enables bfloat16 compute.")
    amp_p.add("--amp_opt_lvl", type=str, metavar="OPT_LVL", default="O1",
              choices=["O0", "O1", "O2", "O3"],
              help="Accepted for compatibility; ignored on TPU. Same choice "
                   "validation as the reference (args.py:20,60).")
    amp_p.add("--keep_batchnorm_fp32", action="store_true", default=None,
              help="Accepted for compatibility; BN statistics are always fp32.")
    amp_p.add("--apex_verbose", action="store_true",
              help="Accepted for compatibility; ignored on TPU.")

    # Distributed (reference args.py:67-75). SPMD needs no launcher or ranks:
    # one process drives all local chips via the mesh.
    distr_p = p.add_argument_group(
        title="Distributed", description="SPMD mesh options (replaces NCCL DDP).")
    distr_p.add("--local_rank", type=int, metavar="RANK", default=0,
                help="Accepted for compatibility; unused under SPMD.")
    distr_p.add("--device", type=int, metavar="DEVICE", default=None, nargs="+",
                help="Accepted for compatibility; TPU devices are auto-detected.")
    distr_p.add("--n_workers", type=int, metavar="NB", default=4,
                help="Number of data-loading prefetch threads.")
    distr_p.add("--n_devices", type=int, metavar="NB", default=None,
                help="Number of devices for the data mesh axis (default: all).")
    distr_p.add("--n_dcn", type=int, metavar="NB", default=1,
                help="Number of slices for multi-slice pods: builds a 2-D "
                     "(dcn, data) mesh with cross-slice collectives on DCN "
                     "and in-slice collectives on ICI (1 = single slice).")
    distr_p.add("--coordinator_address", type=str, metavar="ADDR",
                default=None,
                help="Join a multi-process (multi-host) run: 'auto' on a "
                     "TPU pod (the runtime provides coordinator/rank), or "
                     "an explicit host:port with --num_processes and "
                     "--process_id (the SPMD analogue of the reference's "
                     "torch.distributed launcher).")
    distr_p.add("--num_processes", type=int, metavar="NB", default=None,
                help="Total process count for an explicit "
                     "--coordinator_address host:port.")
    distr_p.add("--process_id", type=int, metavar="RANK", default=None,
                help="This process's id (0..num_processes-1) for an "
                     "explicit --coordinator_address host:port.")

    # Model (reference args.py:77-107)
    model_p = p.add_argument_group(title="Model Configuration",
                                   description="Model parameters.")
    model_p.add("--nhx", type=int, metavar="SIZE", default=128,
                help="Size of vectors encoding frames.")
    model_p.add("--ny", type=int, metavar="SIZE", required=True,
                help="Size of the state-space variable (y).")
    model_p.add("--nz", type=int, metavar="SIZE", required=True,
                help="Size of the auxiliary random variable (z).")
    model_p.add("--n_euler_steps", type=int, metavar="STEPS", default=1,
                help="Number of Euler steps per frame during training and validation.")
    model_p.add("--nt_inf", type=int, metavar="STEPS", required=True,
                help="Number of time steps used to infer y at t = 1 (k).")
    model_p.add("--obs_scale", type=float, metavar="VAR", default=1,
                help="Standard deviation of the distribution of observations.")
    model_p.add("--archi", type=str, metavar="ARCH", default="dcgan",
                choices=ARCH_TYPES, help="Encoder and decoder architecture.")
    model_p.add("--skipco", action="store_true",
                help="Whether to use skip connections from encoders to decoders.")
    model_p.add("--nf", type=int, metavar="FILTERS", default=64,
                help="Number of filters per image channel in the first encoder "
                     "and last decoder layer.")
    model_p.add("--nh_res", type=int, metavar="SIZE", default=512,
                help="Size of hidden layers in the temporal model function f.")
    model_p.add("--nlayers_res", type=int, metavar="NB", default=4,
                help="Number of hidden layers in the temporal model function f.")
    model_p.add("--nh_inf", type=int, metavar="SIZE", default=256,
                help="Size of hidden layers in inference networks.")
    model_p.add("--nlayers_inf", type=int, metavar="NB", default=3,
                help="Number of hidden layers in inference networks.")
    model_p.add("--res_gain", type=float, metavar="GAIN", default=1.41,
                help="Initialization gain of the residual MLP linear layers.")

    # Optimization (reference args.py:108-123)
    opt_p = p.add_argument_group(title="Optimization Configuration",
                                 description="Loss and optimization parameters.")
    opt_p.add("--beta_y", type=float, metavar="BETA", default=1,
              help="Beta scale factor of the KL term for y1 in the loss.")
    opt_p.add("--beta_z", type=float, metavar="BETA", default=1,
              help="Beta scale factor of the KL term for z in the loss.")
    opt_p.add("--l2_res", type=float, metavar="LAMBDA", default=1,
              help="Scale factor for the L2 regularization of residuals.")
    opt_p.add("--batch_size", type=int, metavar="SIZE", default=128,
              help="Global training batch size (sharded over the mesh).")
    opt_p.add("--lr", type=float, metavar="LR", default=0.0003,
              help="Learning rate of the Adam optimizer.")
    opt_p.add("--lr_scheduling_burnin", type=int, metavar="STEPS", default=1000000,
              help="Number of optimization steps before decreasing the lr.")
    opt_p.add("--lr_scheduling_n_iter", type=int, metavar="STEPS", default=100000,
              help="Number of optimization steps for the linear lr decay.")

    # Dataset (reference args.py:125-145)
    data_p = p.add_argument_group(title="Dataset",
                                  description="Chosen dataset and parameters.")
    data_p.add("--dataset", type=str, metavar="DATASET", required=True,
               choices=DATASETS, help="Dataset name.")
    data_p.add("--data_dir", type=str, metavar="DIR", required=True,
               help="Data directory.")
    data_p.add("--seq_len", type=int, metavar="LEN", required=True,
               help="Length of training sequences.")
    data_p.add("--ndigits", type=int, metavar="DIGITS", default=2,
               help="For Moving MNIST only. Number of digits.")
    data_p.add("--max_speed", type=int, metavar="SPEED", default=4,
               help="For Moving MNIST only. Digits maximum speed.")
    data_p.add("--deterministic", action="store_true",
               help="For Moving MNIST only. Deterministic instead of stochastic bounces.")
    data_p.add("--subsampling", type=int, default=8,
               help="For Human3.6M only. Video sampling rate.")
    data_p.add("--nx", type=int, metavar="SIZE", default=64,
               help="Frame size (width and height).")
    data_p.add("--nc", type=int, metavar="CHANNELS", required=True,
               help="Number of color channels (1 for Moving MNIST and KTH, "
                    "3 for BAIR and Human3.6M).")

    # Evaluation (reference args.py:147-163)
    eval_p = p.add_argument_group(title="Evaluation",
                                  description="Evaluation parameters.")
    eval_p.add("--val_interval", type=int, metavar="STEPS", default=20000,
               help="Optimization steps between evaluations / best-model saves.")
    eval_p.add("--chkpt_interval", type=int, metavar="STEPS", default=None,
               help="If not None, save intermediate models every given steps.")
    eval_p.add("--keep_chkpt", type=_nonneg_int, metavar="N", default=None,
               help="If not None, retain only the N most recent periodic "
                    "model_<step>.npz snapshots (model.npz / model_best.npz "
                    "/ train_state.npz are always kept). srvp-tpu extension; "
                    "the reference keeps every snapshot.")
    eval_p.add("--batch_size_test", type=int, metavar="SIZE", default=16,
               help="Validation batch size.")
    eval_p.add("--n_iter_test", type=int, metavar="STEPS", default=25,
               help="Number of batch iterations per validation.")
    eval_p.add("--nt_cond", type=int, metavar="STEPS", required=True,
               help="Number of conditioning frames at test time (>= nt_inf).")
    eval_p.add("--n_samples_test", type=int, metavar="NB", default=100,
               help="Number of predictions per video during validation.")
    eval_p.add("--seq_len_test", type=int, metavar="LEN", default=None,
               help="Length of validation sequences (defaults to seq_len).")

    # TPU-native extras (capability upgrades; SURVEY.md §5)
    tpu_p = p.add_argument_group(title="TPU runtime",
                                 description="TPU-native runtime options.")
    tpu_p.add("--resume", action="store_true",
              help="Resume from the latest full train-state checkpoint in save_path.")
    tpu_p.add("--n_iter", type=int, metavar="STEPS", default=None,
              help="Total optimization steps (default: burnin + decay steps).")
    tpu_p.add("--log_interval", type=int, metavar="STEPS", default=100,
              help="Steps between metric log lines.")
    tpu_p.add("--profile_dir", type=str, metavar="DIR", default=None,
              help="If set, capture a jax.profiler trace of a few steps into DIR.")
    tpu_p.add("--val_samples_chunk", type=int, metavar="NB", default=25,
              help="Best-of-N validation rollouts evaluated per vmapped chunk.")
    tpu_p.add("--allow_synthetic", action="store_true",
              help="For Moving MNIST: fall back to procedural digits when the "
                   "MNIST archive is absent (benchmarks/smoke tests only).")
    tpu_p.add("--no_device_compose", action="store_true",
              help="For Moving MNIST: disable on-device frame compositing and "
                   "ship full uint8 frames instead.")
    tpu_p.add("--steps_per_dispatch", type=int, metavar="K", default=1,
              help="Run K optimization steps per device dispatch (a jitted "
                   "scan over K stacked batches): same RNG/update sequence "
                   "(float drift only from XLA fusion differences), "
                   "amortized dispatch/transfer overhead. Must divide "
                   "log/val/chkpt intervals.")

    return p
