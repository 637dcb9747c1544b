"""Training entry point (library half of the train.py CLI).

End-to-end parity with /root/reference/train.py:192-396, re-architected for
TPU: no process launcher or ranks — one Python process drives the whole mesh
with jit-compiled SPMD steps; data-parallel gradient reduction and SyncBN
come from GSPMD sharding, not NCCL wrappers.
"""

import glob
import os
import random
import signal
import time


import jax
import jax.numpy as jnp

from srvp_tpu import train_lib
from srvp_tpu.data.base import load_dataset
from srvp_tpu.data.loader import DataLoader, infinite_batches
from srvp_tpu.helper import save_json
from srvp_tpu.models.srvp import SRVPConfig
from srvp_tpu.parallel import (make_mesh, replicated, shard_batch,
                               shard_stacked_batches)
from srvp_tpu.utils import checkpoint as ckpt


def model_config(opt):
    return SRVPConfig(nx=opt.nx, nc=opt.nc, nf=opt.nf, nhx=opt.nhx, ny=opt.ny,
                      nz=opt.nz, skipco=bool(opt.skipco), nt_inf=opt.nt_inf,
                      nh_inf=opt.nh_inf, nlayers_inf=opt.nlayers_inf,
                      nh_res=opt.nh_res, nlayers_res=opt.nlayers_res,
                      archi=opt.archi)


def train_hparams(opt):
    precision = opt.get("precision", "float32")
    if opt.get("torch_amp") or opt.get("apex_amp"):
        precision = "bfloat16"
    return train_lib.TrainHParams(
        oversampling=opt.n_euler_steps, obs_scale=opt.obs_scale,
        beta_y=opt.beta_y, beta_z=opt.beta_z, l2_res=opt.l2_res, lr=opt.lr,
        lr_burnin=opt.lr_scheduling_burnin, lr_decay_iter=opt.lr_scheduling_n_iter,
        nt_cond=opt.nt_cond, n_samples_test=opt.n_samples_test,
        val_samples_chunk=opt.get("val_samples_chunk", 25),
        compute_dtype=jnp.bfloat16 if precision == "bfloat16" else jnp.float32)


def main(opt):
    # ----- setup (reference train.py:204-237) -----
    from srvp_tpu.parallel import multihost
    # Must precede any backend use: joins the multi-process runtime on pods
    # (one process per host, one global mesh; reference scales here with
    # torch.distributed ranks instead, train.py:214-219).
    multiproc = multihost.initialize_from_opt(opt)
    primary = multihost.is_primary()
    from srvp_tpu.utils.runtime import MetricsLogger, setup_compilation_cache
    setup_compilation_cache()
    if opt.seed is None:
        opt.seed = random.randint(1, 10000)
    # A drawn seed differs per process; params are replicated, so every
    # process must init from process 0's value.
    opt.seed = multihost.broadcast_seed(opt.seed)
    assert isinstance(opt.seed, int) and opt.seed > 0
    mesh = make_mesh(opt.get("n_devices"), dcn=opt.get("n_dcn") or 1)
    n_dev = mesh.devices.size
    if primary:
        print(f"Learning on {n_dev} device(s) (seed: {opt.seed}): "
              f"{mesh.devices.ravel()[0].platform}"
              + (f" [{multihost.process_count()} processes]"
                 if multiproc else ""))
    assert opt.batch_size % n_dev == 0, "global batch must divide the mesh"

    # ----- data (reference train.py:242-266) -----
    if primary:
        print("Loading data...")
    # Multi-process: each process fetches only its contiguous slice of
    # every global batch (bit-identical items — per-item seeds depend on
    # global position only) and contributes it to the global array via
    # make_array_from_process_local_data. Single-process paths unchanged.
    rank, nproc = multihost.process_index(), multihost.process_count()
    if multiproc:
        assert opt.batch_size % nproc == 0 and \
            opt.batch_size_test % nproc == 0, \
            "global batch sizes must divide the process count"
        # Fail loudly at startup if the rank-based loader slices would not
        # land on the rows this process's mesh devices own (exotic device
        # orders would otherwise silently misassign the data stream).
        multihost.validate_loader_slices(mesh, opt.batch_size)
        multihost.validate_loader_slices(mesh, opt.batch_size_test)
        shard_train = lambda b: multihost.shard_local_batch(mesh, b)  # noqa: E731
        shard_window = lambda bs: multihost.shard_local_stacked(mesh, bs)  # noqa: E731
    else:
        shard_train = lambda b: shard_batch(mesh, b)  # noqa: E731
        shard_window = lambda bs: shard_stacked_batches(mesh, bs)  # noqa: E731
    dataset = load_dataset(opt, True)
    trainset = dataset.get_fold("train")
    valset = dataset.get_fold("val")
    if opt.seq_len_test is not None:
        valset.change_seq_len(opt.seq_len_test)
    seq_len_val = opt.seq_len_test or opt.seq_len
    from srvp_tpu.data.base import collate_uint8
    # Training batches ship as uint8 and convert to [0,1] float ON DEVICE —
    # 4x less host->device traffic (the [0,1] conversion lives in elbo_loss).
    # Moving MNIST goes further: only digit images + trajectories are shipped
    # and frames are composited on device (~35x less traffic).
    if opt.dataset == "smmnist" and not opt.get("no_device_compose"):
        from srvp_tpu.data.device_compose import parts_collate
        from srvp_tpu.data.loader import PartsView
        train_loader = DataLoader(PartsView(trainset), opt.batch_size,
                                  shuffle=True, drop_last=True, seed=opt.seed,
                                  num_workers=opt.n_workers,
                                  collate_fn=parts_collate,
                                  shard_rank=rank, shard_count=nproc)
    else:
        train_loader = DataLoader(trainset, opt.batch_size, shuffle=True,
                                  drop_last=True, seed=opt.seed,
                                  num_workers=opt.n_workers,
                                  collate_fn=collate_uint8,
                                  shard_rank=rank, shard_count=nproc)
    val_loader = DataLoader(valset, opt.batch_size_test, shuffle=True,
                            drop_last=True, seed=opt.seed + 1,
                            num_workers=opt.n_workers,
                            collate_fn=collate_uint8,
                            shard_rank=rank, shard_count=nproc)

    # ----- model + optimizer (reference train.py:271-293) -----
    if primary:
        print("Building model...")
    cfg = model_config(opt)
    hp = train_hparams(opt)
    opt.n_iter = opt.get("n_iter") or (opt.lr_scheduling_burnin
                                       + opt.lr_scheduling_n_iter)
    ts = train_lib.init_train_state(jax.random.PRNGKey(opt.seed), cfg, hp,
                                    res_gain=opt.res_gain)
    ts = jax.device_put(ts, replicated(mesh))
    resumed_step, resumed_best = None, None
    if opt.get("resume") and ckpt.has_train_state(opt.save_path):
        ts, meta = ckpt.load_train_state(opt.save_path, ts)
        ts = jax.device_put(ts, replicated(mesh))
        resumed_step = int(ts.step)
        # The best-val tracker must survive the resume, or the first
        # post-resume validation silently overwrites model_best.npz even
        # when it is worse than the pre-interruption best.
        resumed_best = meta.get("best_val_metric")
        # Resume consumes the same data sequence an uninterrupted run would:
        # skip the batches the interrupted run already trained on (free —
        # the loader's stream is position-seeded).
        train_loader.fast_forward(resumed_step)
        if primary:
            print(f"Resumed from step {resumed_step}")

    # Only the primary process touches the experiment directory (shared
    # filesystem on pods); the others see checkpoints through it on resume.
    if primary:
        os.makedirs(opt.save_path, exist_ok=True)
        # A crash mid-save can strand partial .tmp files (writes are
        # tmp+rename); clear them so the xp dir only ever holds complete
        # artifacts.
        for stale in glob.glob(os.path.join(opt.save_path, "*.tmp.npz")) + \
                glob.glob(os.path.join(opt.save_path, "*.json.tmp")):
            os.remove(stale)
        save_json({k: v for k, v in opt.items()},
                  os.path.join(opt.save_path, "config.json"))
    mlog = MetricsLogger(os.path.join(opt.save_path, "metrics.jsonl"),
                         truncate_after=resumed_step) if primary else None

    train_step = train_lib.make_train_step(cfg, hp)
    spd = opt.get("steps_per_dispatch") or 1
    if spd > 1 and opt.get("profile_dir"):
        print("steps_per_dispatch forced to 1: --profile_dir traces "
              "individual steps")
        spd = 1
    if spd > 1:
        for nm in ("log_interval", "val_interval", "chkpt_interval"):
            iv = opt.get(nm)
            if iv and iv % spd:
                raise ValueError(
                    f"--steps_per_dispatch {spd} must divide --{nm} {iv} "
                    f"(boundary actions fire between dispatch windows)")
    multi_step = (train_lib.make_train_step(cfg, hp, steps_per_call=spd)
                  if spd > 1 else None)
    eval_batch = train_lib.make_eval_batch(cfg, hp, nt=seq_len_val)
    eval_key = jax.random.PRNGKey(opt.seed + 123)

    # ----- training loop (reference train.py:321-384) -----
    assert opt.n_iter > 0
    itr = int(ts.step)
    val_metric, best_val_metric = None, resumed_best
    metrics = None
    log_interval = opt.get("log_interval", 100)
    status_code = 0
    t_last, itr_last = time.time(), itr
    frames_per_batch = opt.seq_len * opt.batch_size

    profile_dir = opt.get("profile_dir")

    def device_batches(start_itr):
        """Double-buffered host->device pipeline: the next batch's transfer
        is dispatched (device_put is async) while the current step runs.

        Yields (width, batch): width == steps_per_dispatch windows (batches
        stacked on a leading axis, consumed by one scan dispatch) whenever
        the step counter is window-aligned and a full window fits before
        n_iter; single steps otherwise (e.g. right after resuming from an
        unaligned SIGTERM checkpoint, or the ragged tail before n_iter).
        The iteration sequence is deterministic in start_itr, so prefetch
        tracks its own simulated counter."""
        it = infinite_batches(train_loader)

        def fetch(i):
            if spd > 1 and i % spd == 0 and i + spd <= opt.n_iter:
                return spd, shard_window([next(it) for _ in range(spd)])
            return 1, shard_train(next(it))

        i = start_itr
        nxt = fetch(i)
        while True:
            cur = nxt
            i += cur[0]
            nxt = fetch(i)
            yield cur

    # Graceful preemption: SIGTERM checkpoints the full train state and exits
    # cleanly so --resume continues bit-identically (capability upgrade over
    # the reference, which loses optimizer state on any interruption).
    stop_requested = []
    prev_handler = signal.signal(
        signal.SIGTERM, lambda *_: stop_requested.append(True))

    # Async checkpoint writer: periodic/best saves snapshot the state with
    # on-device copies and write from a background thread, so the step loop
    # never blocks on device_get + compression (measured ~45 s per
    # checkpoint+val boundary on the tunneled v5e before this).
    writer = ckpt.AsyncCheckpointer()

    try:
        for width, batch in device_batches(itr):
            if itr >= opt.n_iter or stop_requested:
                break
            itr += width
            if profile_dir and itr == 10:
                jax.profiler.start_trace(profile_dir)
            ts, metrics = (train_step(ts, batch) if width == 1
                           else multi_step(ts, batch))
            if profile_dir and itr == 15:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                print(f"Profiler trace written to {profile_dir}")

            if itr % log_interval == 0 and primary:
                m = {k: float(v) for k, v in metrics.items()}
                now = time.time()
                fps = frames_per_batch * (itr - itr_last) / max(now - t_last, 1e-9)
                t_last, itr_last = now, itr
                print(f"[{itr}/{opt.n_iter}] loss={m['loss']:.4f} "
                      f"nll={m['nll']:.4f} kl_y_0={m['kl_y_0']:.4f} "
                      f"kl_z={m['kl_z']:.4f} lr={m['lr']:.2e} "
                      f"fps={fps:.0f} val={val_metric} best={best_val_metric}",
                      flush=True)
                mlog.log(itr, fps=fps, **m)

            if itr % opt.val_interval == 0:
                # Every process runs validation (the eval program's
                # reductions are global collectives); val_metric comes out
                # identical everywhere, so the best-val decision stays in
                # sync and only the primary writes.
                val_metric = train_lib.evaluate(
                    eval_batch, ts.params, ts.bn_state, iter(val_loader),
                    opt.n_iter_test, jax.random.fold_in(eval_key, itr),
                    shard_fn=shard_train,
                    pad_to=1 if multiproc else mesh.devices.size)
                if primary:
                    print(f"[{itr}] val_metric (-PSNR): {val_metric:.4f}",
                          flush=True)
                    mlog.log(itr, val_metric=val_metric)
                if best_val_metric is None or best_val_metric > val_metric:
                    best_val_metric = val_metric
                    # Snapshot on EVERY process (an eager device copy on
                    # global arrays must be dispatched by all controllers);
                    # only the primary consumes it. device_get of the
                    # replicated copies reads local shards — no dispatch.
                    snap = writer.snapshot((ts.params, ts.bn_state))
                    if primary:
                        def save_best(s=snap):
                            # One batched transfer, then the device copy is
                            # free for the rest of the (compressing) write.
                            s = jax.device_get(s)
                            ckpt.save_model(opt.save_path, "model_best",
                                            s[0], s[1])
                        writer.submit(save_best)

            if opt.chkpt_interval is not None and itr % opt.chkpt_interval == 0:
                snap = writer.snapshot(ts)

                if primary:
                    def save_periodic(s=snap, i=itr, bv=best_val_metric):
                        s = jax.device_get(s)
                        ckpt.save_model(opt.save_path, f"model_{i}", s.params,
                                        s.bn_state)
                        ckpt.save_train_state(opt.save_path, s,
                                              extra={"best_val_metric": bv})
                        # Prune AFTER the new snapshot landed, on the writer
                        # thread, so the newest file is never a deletion
                        # victim and the step loop never blocks on
                        # filesystem walks.
                        ckpt.prune_periodic(opt.save_path,
                                            opt.get("keep_chkpt"))
                    writer.submit(save_periodic)
    except KeyboardInterrupt:
        status_code = 130
    finally:
        signal.signal(signal.SIGTERM, prev_handler)
    if stop_requested and primary:
        print("SIGTERM received: checkpointing and exiting")
    if stop_requested:
        status_code = 143

    # ----- final save (reference train.py:377-383) -----
    if primary:
        print("Saving...")
        writer.wait()  # in-flight periodic save must not land after this one
        ckpt.save_model(opt.save_path, "model", ts.params, ts.bn_state)
        ckpt.save_train_state(opt.save_path, jax.device_get(ts),
                              extra={"best_val_metric": best_val_metric})
        mlog.close()
    # All processes leave together — a non-primary exiting early would tear
    # down its side of the runtime while the primary is still writing.
    multihost.sync("final-checkpoint")
    if primary:
        print("Done")
    return status_code
