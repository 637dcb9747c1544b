"""Async checkpointing + configurable-compression serialization.

The train loop snapshots state with on-device copies and writes from a
background thread (srvp_tpu/utils/checkpoint.py AsyncCheckpointer), so
periodic saves never block stepping (measured ~45 s per checkpoint
boundary on the tunneled v5e with the synchronous path). These tests pin:
npz wire-format compatibility at every compression level, writer error
propagation and ordering, and that a training run with async periodic
checkpoints produces bit-identical final state to an uninterrupted run.
"""

import threading
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from srvp_tpu.utils import checkpoint as ckpt  # noqa: E402
from srvp_tpu.utils.serialization import load_npz, save_npz  # noqa: E402


@pytest.mark.parametrize("level", [0, 1, 6])
def test_save_npz_levels_roundtrip_and_np_load(tmp_path, level):
    tree = {"a": jnp.arange(12.0).reshape(3, 4),
            "b": {"c": jnp.ones((2,), jnp.int32)},
            "step": jnp.zeros((), jnp.int32)}  # 0-d must stay 0-d
    path = str(tmp_path / f"t{level}.npz")
    save_npz(path, tree, compresslevel=level)
    back = load_npz(path, tree)
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["b"]["c"], tree["b"]["c"])
    assert back["step"].shape == () and int(back["step"]) == 0
    # plain np.load reads the archive too (standard npz layout)
    with np.load(path) as arc:
        assert sorted(arc.files) == ["['a']", "['b']['c']", "['step']"]
        np.testing.assert_array_equal(arc["['a']"], np.asarray(tree["a"]))


def test_async_writer_runs_and_waits(tmp_path):
    w = ckpt.AsyncCheckpointer()
    done = []
    w.submit(lambda: (time.sleep(0.05), done.append(1)))
    w.wait()
    assert done == [1]


def test_async_writer_serializes_submissions():
    """A second submit waits for the in-flight save (single pending save)."""
    w = ckpt.AsyncCheckpointer()
    order = []
    gate = threading.Event()
    w.submit(lambda: (gate.wait(2.0), order.append("first")))
    t = threading.Thread(
        target=lambda: w.submit(lambda: order.append("second")))
    t.start()
    time.sleep(0.05)
    assert order == []  # second submit is blocked on the first
    gate.set()
    t.join(5.0)
    w.wait()
    assert order == ["first", "second"]


def test_async_writer_raises_background_error_on_wait():
    w = ckpt.AsyncCheckpointer()
    w.submit(lambda: (_ for _ in ()).throw(IOError("disk full")))
    with pytest.raises(RuntimeError, match="background checkpoint save"):
        w.wait()
    # error is consumed; the writer is reusable afterwards
    w.submit(lambda: None)
    w.wait()


def test_snapshot_is_a_distinct_device_copy():
    x = {"p": jnp.arange(4.0)}
    snap = ckpt.AsyncCheckpointer.snapshot(x)
    assert snap["p"] is not x["p"]
    assert snap["p"].unsafe_buffer_pointer() != x["p"].unsafe_buffer_pointer()
    np.testing.assert_array_equal(np.asarray(snap["p"]), np.asarray(x["p"]))


def test_metrics_logger_truncates_rows_past_resumed_step(tmp_path):
    """An ungraceful death between checkpoints leaves metrics rows with no
    matching state; resume must drop them instead of appending a
    contradictory second copy."""
    import json as json_mod
    from srvp_tpu.utils.runtime import MetricsLogger
    path = tmp_path / "metrics.jsonl"
    rows = [{"step": s, "loss": float(s)} for s in (100, 200, 300, 400)]
    path.write_text("".join(json_mod.dumps(r) + "\n" for r in rows)
                    + '{"step": 500, "lo')  # half-written trailing line
    m = MetricsLogger(str(path), truncate_after=200)
    m.log(300, loss=-1.0)
    m.close()
    kept = [json_mod.loads(line) for line in path.read_text().splitlines()]
    assert [r["step"] for r in kept] == [100, 200, 300]
    assert kept[-1]["loss"] == -1.0  # the re-run row, not the orphan


def test_save_model_is_atomic_under_write_failure(tmp_path, monkeypatch):
    """A crash mid-write (background writer thread) must never leave a
    truncated model_best.npz for a later --resume to load: saves go to a
    tmp file and are renamed into place only on success."""
    params = {"w": jnp.ones((3,))}
    bn = {"m": jnp.zeros((3,))}
    ckpt.save_model(str(tmp_path), "model_best", params, bn)
    good = (tmp_path / "model_best.npz").read_bytes()

    def exploding_save_npz(path, tree, **kw):
        with open(path, "wb") as f:
            f.write(b"partial")
        raise IOError("disk full")

    monkeypatch.setattr(ckpt, "save_npz", exploding_save_npz)
    with pytest.raises(IOError):
        ckpt.save_model(str(tmp_path), "model_best",
                        {"w": jnp.zeros((3,))}, bn)
    # target untouched, only the tmp file holds the partial write
    assert (tmp_path / "model_best.npz").read_bytes() == good
    with pytest.raises(IOError):
        ckpt.save_train_state(
            str(tmp_path),
            __import__("collections").namedtuple("TS", "step")(
                step=jnp.zeros((), jnp.int32)))
    assert not (tmp_path / ckpt.TRAIN_STATE_FILE).exists()


def test_training_with_async_periodic_saves_matches_uninterrupted(tmp_path):
    """chkpt_interval saves run through the async writer; the final model
    and the periodic train_state must be exactly what the synchronous path
    produced (same seed, same steps => bit-identical state)."""
    from srvp_tpu import args as args_mod
    from srvp_tpu.helper import DotDict
    from srvp_tpu.train_main import main as train_main

    base = (f"--dataset smmnist --data_dir {tmp_path} "
            "--ny 4 --nz 4 --nt_cond 3 --nt_inf 2 --nc 1 --seq_len 6 "
            "--seed 5 --nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 --nh_res 16 "
            "--nlayers_res 2 --batch_size 8 --n_iter 4 --val_interval 4 "
            "--n_iter_test 1 --n_samples_test 2 --val_samples_chunk 2 "
            "--log_interval 2 --allow_synthetic --n_workers 1 "
            "--batch_size_test 4 --seq_len_test 6").split()

    xp_a = tmp_path / "a"
    opt = DotDict(vars(args_mod.create_args().parse_args(
        base + ["--save_path", str(xp_a), "--chkpt_interval", "2"])))
    assert train_main(opt) == 0
    assert (xp_a / "model_2.npz").exists() and (xp_a / "model_4.npz").exists()

    xp_b = tmp_path / "b"
    opt = DotDict(vars(args_mod.create_args().parse_args(
        base + ["--save_path", str(xp_b)])))
    assert train_main(opt) == 0

    with np.load(xp_a / "model.npz") as a, np.load(xp_b / "model.npz") as b:
        assert sorted(a.files) == sorted(b.files)
        for k in a.files:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # the async periodic model_4 snapshot equals the final model (same step)
    with np.load(xp_a / "model_4.npz") as a4, np.load(xp_a / "model.npz") as af:
        for k in a4.files:
            np.testing.assert_array_equal(a4[k], af[k], err_msg=k)


def test_prune_periodic_retention(tmp_path):
    """--keep_chkpt retention: only numeric model_<step>.npz beyond the N
    newest are deleted; model.npz / model_best.npz / train_state.npz and
    in-flight .tmp.npz files are never candidates."""
    keep_always = ["model.npz", "model_best.npz", "train_state.npz",
                   "model_77.npz.tmp.npz", "model_x.npz"]
    periodic = [f"model_{s}.npz" for s in (1000, 2000, 10000, 9000)]
    for fname in keep_always + periodic:
        (tmp_path / fname).write_bytes(b"x")

    ckpt.prune_periodic(str(tmp_path), keep=2)
    left = sorted(p.name for p in tmp_path.iterdir())
    assert left == sorted(keep_always + ["model_9000.npz", "model_10000.npz"])

    # keep=None is a no-op; keep=0 removes every periodic snapshot
    ckpt.prune_periodic(str(tmp_path), keep=None)
    assert sorted(p.name for p in tmp_path.iterdir()) == left
    ckpt.prune_periodic(str(tmp_path), keep=0)
    assert sorted(p.name for p in tmp_path.iterdir()) == sorted(keep_always)


def test_keep_chkpt_flag_prunes_during_training(tmp_path):
    """CLI seam: a run with --chkpt_interval 1 --keep_chkpt 1 ends with only
    the newest periodic snapshot (plus model/model_best/train_state)."""
    from srvp_tpu import args as args_mod
    from srvp_tpu.helper import DotDict
    from srvp_tpu.train_main import main as train_main

    base = (f"--dataset smmnist --data_dir {tmp_path} "
            "--ny 4 --nz 4 --nt_cond 3 --nt_inf 2 --nc 1 --seq_len 6 "
            "--seed 5 --nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 --nh_res 16 "
            "--nlayers_res 2 --batch_size 8 --n_iter 4 --val_interval 4 "
            "--n_iter_test 1 --n_samples_test 2 --val_samples_chunk 2 "
            "--log_interval 2 --allow_synthetic --n_workers 1 "
            "--batch_size_test 4 --seq_len_test 6").split()
    xp = tmp_path / "xp"
    opt = DotDict(vars(args_mod.create_args().parse_args(
        base + ["--save_path", str(xp), "--chkpt_interval", "1",
                "--keep_chkpt", "1"])))
    assert train_main(opt) == 0
    periodic = sorted(p.name for p in xp.iterdir()
                      if p.name.startswith("model_")
                      and p.name[len("model_"):-len(".npz")].isdigit())
    assert periodic == ["model_4.npz"]
    assert (xp / "model.npz").exists() and (xp / "train_state.npz").exists()
