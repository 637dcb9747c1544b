"""Checkpointing: model snapshots + full train-state checkpoints with resume.

The reference saves params-only .pt files and has NO resume path
(/root/reference/train.py:362,366,382; SURVEY.md §5). Here:
  * model_{best,itr,final} snapshots hold params + batch-norm state
    (model.npz / model_best.npz / model_{itr}.npz, mirroring the reference's
    file naming with .npz instead of .pt)
  * train_state.npz holds the FULL state (params, BN stats, Adam moments,
    step, base RNG key) so --resume continues bit-identically
"""

import json
import os
import threading

from srvp_tpu.utils.serialization import load_npz, save_npz

TRAIN_STATE_FILE = "train_state.npz"
TRAIN_META_FILE = "train_state.json"


class AsyncCheckpointer:
    """Background checkpoint writer (one pending save at a time).

    TPU-native async checkpointing: the train loop snapshots the (donated)
    train state with on-device copies (`snapshot`, ~0 ms on the host), then
    `submit`s a closure that device_gets the un-donated copies and writes
    them from a daemon thread while training keeps stepping. Submitting
    while a save is in flight waits for it first (bounds host memory to one
    snapshot); `wait()` must be called before the final synchronous save.
    A failed background save re-raises on the next submit/wait so write
    errors (disk full, ...) cannot pass silently.
    """

    def __init__(self):
        self._thread = None
        self._error = None

    @staticmethod
    def snapshot(tree):
        """On-device copy of a pytree: never donated to any step, so a
        background device_get cannot race buffer donation."""
        import jax
        import jax.numpy as jnp
        return jax.tree_util.tree_map(jnp.copy, tree)

    def submit(self, fn):
        self.wait()

        def run():
            try:
                fn()
            except BaseException as e:  # surfaced on next wait()
                self._error = e

        self._thread = threading.Thread(
            target=run, name="srvp-ckpt-writer", daemon=True)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("background checkpoint save failed") from err


def save_model(save_path, name, params, bn_state):
    # Atomic (tmp + rename): these run on a background writer thread, so a
    # crash mid-write must not leave a truncated model_best.npz behind for a
    # later --resume to silently load.
    target = os.path.join(save_path, f"{name}.npz")
    tmp = target + ".tmp.npz"
    save_npz(tmp, {"params": params, "bn_state": bn_state})
    os.replace(tmp, target)


def prune_periodic(save_path, keep):
    """Delete all but the `keep` most recent periodic model_<step>.npz.

    Only strictly-numeric periodic snapshots are candidates — model.npz,
    model_best.npz, train_state.npz and in-flight *.tmp.npz files are never
    touched. A 100k-step run at --chkpt_interval 1000 writes ~9 GB of
    periodic snapshots; with --keep_chkpt N disk stays bounded at N files
    while --resume still has train_state.npz (which is separate and always
    current). No-op when keep is None.
    """
    if keep is None:
        return
    if keep < 0:
        # keep=-2 would otherwise slice as sorted(steps)[:-(-2)] — inverted,
        # unbounded retention — so reject loudly (also rejected at argparse
        # time in srvp_tpu.args).
        raise ValueError(f"--keep_chkpt must be >= 0, got {keep}")
    steps = []
    for fname in os.listdir(save_path):
        if not (fname.startswith("model_") and fname.endswith(".npz")):
            continue
        stem = fname[len("model_"):-len(".npz")]
        if stem.isdigit():
            steps.append(int(stem))
    doomed = sorted(steps)[:-keep] if keep > 0 else sorted(steps)
    for step in doomed:
        try:
            os.remove(os.path.join(save_path, f"model_{step}.npz"))
        except FileNotFoundError:
            pass  # concurrent external cleanup; retention goal already met


def load_model(path, params_template, bn_state_template):
    tree = load_npz(path, {"params": params_template, "bn_state": bn_state_template})
    return tree["params"], tree["bn_state"]


def save_train_state(save_path, ts, extra=None):
    tmp = os.path.join(save_path, TRAIN_STATE_FILE + ".tmp.npz")
    save_npz(tmp, ts._asdict())
    os.replace(tmp, os.path.join(save_path, TRAIN_STATE_FILE))
    meta = {"step": int(ts.step)}
    if extra:
        meta.update(extra)
    meta_target = os.path.join(save_path, TRAIN_META_FILE)
    meta_tmp = meta_target + ".tmp"
    with open(meta_tmp, "w") as f:
        json.dump(meta, f)
    os.replace(meta_tmp, meta_target)


def load_train_state(save_path, ts_template):
    path = os.path.join(save_path, TRAIN_STATE_FILE)
    tree = load_npz(path, ts_template._asdict())
    meta_path = os.path.join(save_path, TRAIN_META_FILE)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return type(ts_template)(**tree), meta


def has_train_state(save_path):
    return os.path.exists(os.path.join(save_path, TRAIN_STATE_FILE))
