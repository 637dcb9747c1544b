#!/usr/bin/env python
"""Offline-artifact drop contract: validate a drop of pretrained weights /
datasets BEFORE they are consumed, so that when network access finally
exists, reproducing paper numbers is one command rather than a debugging
session.

The three environment-blocked artifact families (and the exact code that
will consume them):

  * LPIPS weights — the official v0.1 linear heads (`alex.pth`,
    /root/reference/metrics/lpips/dist_model.py:57-67) plus a torchvision
    alexnet state_dict; consumed by srvp_tpu/metrics/lpips.py
    load_lpips_params.
  * I3D kinetics-400 npz — produced from the TF-Hub module by
    scripts/convert_i3d.py (/root/reference/metrics/fvd/fvd.py:89-126);
    consumed by srvp_tpu.metrics.i3d.load_i3d_npz.
  * Released SRVP checkpoints + official test sets
    (/root/reference/README.md:15-18,150-171); consumed by
    scripts/convert_checkpoint.py and the data loaders.

Expected drop layout (every entry optional — whatever is present is
validated; see README "When you have network access"):

    DROP/
      lpips/alex.pth                     # v0.1 linear heads
      lpips/alexnet.pth                  # torchvision backbone (or
      lpips/alexnet-owt-*.pth            #  the torchvision download name)
      i3d/i3d_kinetics400.npz            # scripts/convert_i3d.py output
      mnist/train-images-idx3-ubyte      # raw MNIST (idx, optionally .gz)
      checkpoints/<xp>/{model.pt,config.json}   # released pretrained models
      datasets/smmnist_test_2digits_64.npz
      datasets/mmnist_test_2digits_64.npz       # deterministic variant
      datasets/svg_test_set_40.npz              # KTH
      datasets/human/test_set_53_8/*.npz        # Human3.6M
      datasets/bair/processed_data/test/...     # BAIR PNG tree

Usage:
    python scripts/verify_artifacts.py --drop DIR [--manifest out.json]
    python scripts/verify_artifacts.py --drop DIR --check_manifest accepted.json

Exit code 0 iff every artifact present in the drop validates. Writes a
sha256 + status manifest when --manifest is given.

--check_manifest closes the loop on an ACCEPTED drop: after a drop has
been validated once and its manifest recorded (--manifest), any future
session can re-validate byte-identity in one command — every artifact the
accepted manifest lists must be present with an identical sha256 (files)
or a clean structural validation (directories). A changed, missing, or
invalid artifact rejects with a per-artifact CHANGED/MISSING/INVALID row,
so the "drop files -> one command -> parity eval" path involves no
judgment calls.
"""

import argparse
import glob
import gzip
import hashlib
import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# torchvision alexnet feature-conv shapes (out, in, k, k): must match
# srvp_tpu/metrics/lpips.py _ALEX_CONVS.
_ALEX_FEATURES = {0: (64, 3, 11, 11), 3: (192, 64, 5, 5), 6: (384, 192, 3, 3),
                  8: (256, 384, 3, 3), 10: (256, 256, 3, 3)}
_LPIPS_CHANNELS = (64, 192, 384, 256, 256)


class Invalid(Exception):
    pass


def _torch_load(path):
    import torch
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: np.asarray(v) for k, v in sd.items()}


def check_lpips_lin(path):
    sd = _torch_load(path)
    for i, c in enumerate(_LPIPS_CHANNELS):
        key = f"lin{i}.model.1.weight"
        if key not in sd:
            raise Invalid(f"missing key {key} (have {sorted(sd)[:8]}...)")
        got = tuple(sd[key].shape)
        if got != (1, c, 1, 1):
            raise Invalid(f"{key}: shape {got}, expected (1, {c}, 1, 1)")
        if not np.all(np.isfinite(sd[key])):
            raise Invalid(f"{key}: non-finite values")
    return f"5 linear heads, channels {_LPIPS_CHANNELS}"


def check_alexnet(path):
    sd = _torch_load(path)
    for i, shape in _ALEX_FEATURES.items():
        for suffix, want in ((f"features.{i}.weight", shape),
                             (f"features.{i}.bias", (shape[0],))):
            if suffix not in sd:
                raise Invalid(f"missing key {suffix}")
            got = tuple(sd[suffix].shape)
            if got != want:
                raise Invalid(f"{suffix}: shape {got}, expected {want}")
    return f"{len(_ALEX_FEATURES)} feature convs"


def check_i3d(path):
    from scripts.convert_i3d import expected_variable_specs
    with np.load(path) as arc:
        keys = set(arc.files)
        expected = expected_variable_specs()
        missing = [p for p, _ in expected if p not in keys]
        if missing:
            raise Invalid(f"{len(missing)} missing variables, first: "
                          f"{missing[:3]}")
        extra = keys - {p for p, _ in expected}
        if extra:
            raise Invalid(f"{len(extra)} unexpected keys, first: "
                          f"{sorted(extra)[:3]}")
        for p, shape in expected:
            got = tuple(arc[p].shape)
            if got != tuple(shape):
                raise Invalid(f"{p}: shape {got}, expected {tuple(shape)}")
    return f"{len(expected)} variables, full kinetics-400 inventory"


def check_checkpoint(xp_dir):
    """A released model dir: config.json + model.pt convert cleanly and the
    converted pytree matches the freshly-initialized model structure."""
    import jax
    from srvp_tpu.helper import DotDict, load_json
    from srvp_tpu.models import srvp
    from srvp_tpu.train_main import model_config
    from srvp_tpu.utils.torch_convert import convert_state_dict

    cfg_path = os.path.join(xp_dir, "config.json")
    pt_candidates = sorted(glob.glob(os.path.join(xp_dir, "*.pt")))
    if not os.path.exists(cfg_path):
        raise Invalid("missing config.json")
    if not pt_candidates:
        raise Invalid("no .pt checkpoint found")
    cfg = model_config(DotDict(load_json(cfg_path)))
    sd = _torch_load(pt_candidates[0])
    try:
        params, state = convert_state_dict(sd, cfg)
    except KeyError as e:
        raise Invalid(f"state_dict missing key {e} for archi={cfg.archi}")
    ref_params, ref_state = srvp.init(jax.random.PRNGKey(0), cfg)
    for name, got_tree, want_tree in (("params", params, ref_params),
                                      ("state", state, ref_state)):
        got = jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), got_tree)
        want = jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), want_tree)
        if got != want:
            gl, wl = jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)
            raise Invalid(f"converted {name} tree does not match model init "
                          f"({len(gl)} vs {len(wl)} leaves or shape mismatch)")
    n = len(jax.tree_util.tree_leaves(params))
    return f"{os.path.basename(pt_candidates[0])}: {n} tensors, archi={cfg.archi}"


def check_video_npz(path, min_len, time_axis, nx=64):
    """sequences array: (T, N, H, W) time-major [smmnist, time_axis=0] or
    (N, T, H, W[,C]) video-major [KTH, time_axis=1]; uint8. The protocol
    length constrains the TIME dim specifically — checking "either leading
    dim" would be vacuous on real drops, where the video count (1000-5000)
    always exceeds min_len."""
    with np.load(path, allow_pickle=True) as arc:
        if "sequences" not in arc.files:
            raise Invalid(f"missing 'sequences' (have {arc.files})")
        seq = arc["sequences"]
    if seq.dtype != np.uint8:
        raise Invalid(f"sequences dtype {seq.dtype}, expected uint8")
    if seq.ndim not in (4, 5):
        raise Invalid(f"sequences ndim {seq.ndim}, expected 4 or 5")
    if nx not in seq.shape[2:4]:
        raise Invalid(f"sequences shape {seq.shape}: no {nx}px spatial dim")
    if seq.shape[time_axis] < min_len:
        raise Invalid(f"sequences shape {seq.shape}: time dim "
                      f"{seq.shape[time_axis]} shorter than protocol "
                      f"length {min_len}")
    return f"sequences {seq.shape} {seq.dtype}"


def check_mnist_idx(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rb") as f:
        magic, n = struct.unpack(">II", f.read(8))
    if magic == 2051:
        return f"idx3 images, n={n}"
    if magic == 2049:
        return f"idx1 labels, n={n}"
    raise Invalid(f"bad idx magic {magic}")


def check_human_dir(d):
    files = sorted(f for f in os.listdir(d) if f.endswith(".npz"))
    if not files:
        raise Invalid("no .npz videos")
    with np.load(os.path.join(d, files[0])) as arc:
        if "image" not in arc.files:
            raise Invalid(f"{files[0]}: missing 'image' (have {arc.files})")
        img = arc["image"]
        if img.dtype != np.uint8 or img.ndim != 4:
            raise Invalid(f"{files[0]}: image {img.shape} {img.dtype}, "
                          "expected uint8 (T, H, W, C)")
    return f"{len(files)} videos, first {img.shape}"


def check_bair_dir(d):
    root = os.path.join(d, "processed_data", "test")
    if not os.path.isdir(root):
        raise Invalid("missing processed_data/test/")
    n = 0
    for d1 in sorted(os.listdir(root))[:4]:
        for d2 in sorted(os.listdir(os.path.join(root, d1)))[:4]:
            pngs = [f for f in os.listdir(os.path.join(root, d1, d2))
                    if f.endswith(".png")]
            if len(pngs) < 30:
                raise Invalid(f"{d1}/{d2}: {len(pngs)} frames, expected >=30")
            n += 1
    if n == 0:
        raise Invalid("no video dirs under processed_data/test/")
    return f"sampled {n} video dirs, >=30 PNG frames each"


def sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def discover(drop):
    """Yields (artifact_name, path, validator)."""
    j = os.path.join
    for name, rel, fn in [
            ("lpips-linear-heads", "lpips/alex.pth", check_lpips_lin),
            ("lpips-linear-heads", "lpips/weights/v0.1/alex.pth",
             check_lpips_lin),
            ("i3d-kinetics400", "i3d/i3d_kinetics400.npz", check_i3d),
            ("smmnist-test-set", "datasets/smmnist_test_2digits_64.npz",
             lambda p: check_video_npz(p, min_len=25, time_axis=0)),
            ("mmnist-det-test-set", "datasets/mmnist_test_2digits_64.npz",
             lambda p: check_video_npz(p, min_len=100, time_axis=0)),
            ("kth-test-set", "datasets/svg_test_set_40.npz",
             lambda p: check_video_npz(p, min_len=40, time_axis=1)),
    ]:
        if os.path.exists(j(drop, rel)):
            yield name, j(drop, rel), fn
    for p in ([j(drop, "lpips", "alexnet.pth")]
              + sorted(glob.glob(j(drop, "lpips", "alexnet-owt-*.pth")))):
        if os.path.exists(p):
            yield "alexnet-backbone", p, check_alexnet
            break
    for p in sorted(glob.glob(j(drop, "mnist", "*ubyte*"))):
        yield "mnist-idx", p, check_mnist_idx
    for xp in sorted(glob.glob(j(drop, "checkpoints", "*"))):
        if os.path.isdir(xp):
            yield f"checkpoint:{os.path.basename(xp)}", xp, check_checkpoint
    hd = j(drop, "datasets", "human")
    if os.path.isdir(hd):
        for sub in sorted(os.listdir(hd)):
            if sub.startswith("test_set_"):
                yield "human-test-set", j(hd, sub), check_human_dir
    if os.path.isdir(j(drop, "datasets", "bair")):
        yield "bair-test-set", j(drop, "datasets", "bair"), check_bair_dir


def verify_drop(drop):
    """Returns (results, ok): results is a list of per-artifact dicts."""
    results = []
    for name, path, fn in discover(drop):
        row = {"artifact": name, "path": os.path.relpath(path, drop)}
        try:
            row["detail"] = fn(path)
            row["status"] = "ok"
        except Invalid as e:
            row["status"] = "INVALID"
            row["detail"] = str(e)
        except Exception as e:  # unreadable/corrupt file
            row["status"] = "INVALID"
            row["detail"] = f"{type(e).__name__}: {e}"
        if os.path.isfile(path):
            row["sha256"] = sha256(path)
        results.append(row)
    ok = bool(results) and all(r["status"] == "ok" for r in results)
    return results, ok


def check_against_manifest(results, manifest_path):
    """Compares a fresh validation pass against an ACCEPTED manifest.

    Returns (rows, ok): one row per accepted artifact — ok requires every
    accepted artifact present, structurally valid, and (for files)
    byte-identical by sha256. Artifacts in the drop but not in the
    manifest are allowed (a drop may grow); anything the manifest lists
    is contractual."""
    with open(manifest_path) as f:
        accepted = json.load(f)
    if not accepted.get("ok"):
        return [{"artifact": "<manifest>", "status": "REJECTED",
                 "detail": "accepted manifest has ok=false; re-record it "
                           "from a fully valid drop"}], False
    by_path = {r["path"]: r for r in results}
    rows, ok = [], True
    for a in accepted.get("artifacts", []):
        row = {"artifact": a["artifact"], "path": a["path"]}
        cur = by_path.get(a["path"])
        if cur is None:
            row["status"], row["detail"] = "MISSING", \
                "listed in the accepted manifest but absent from the drop"
            ok = False
        elif cur["status"] != "ok":
            row["status"], row["detail"] = "INVALID", cur["detail"]
            ok = False
        elif a.get("sha256") and a["sha256"] != cur.get("sha256"):
            row["status"] = "CHANGED"
            row["detail"] = (f"sha256 {cur.get('sha256', '')[:12]}... != "
                             f"accepted {a['sha256'][:12]}...")
            ok = False
        else:
            row["status"], row["detail"] = "ok", "matches accepted manifest"
        rows.append(row)
    return rows, ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--drop", required=True, help="Drop directory to validate")
    p.add_argument("--manifest", help="Write sha256+status manifest JSON here")
    p.add_argument("--check_manifest", metavar="JSON",
                   help="Validate the drop against a previously accepted "
                        "manifest (presence + sha256 byte-identity)")
    args = p.parse_args()

    results, ok = verify_drop(args.drop)
    for r in results:
        print(json.dumps(r), flush=True)
    if not results:
        print(json.dumps({"status": "EMPTY",
                          "detail": f"no known artifacts under {args.drop}"}))
    if args.check_manifest:
        rows, mok = check_against_manifest(results, args.check_manifest)
        for r in rows:
            print(json.dumps({"manifest_check": r}), flush=True)
        ok = ok and mok
    if args.manifest:
        with open(args.manifest, "w") as f:
            json.dump({"drop": os.path.abspath(args.drop), "ok": ok,
                       "artifacts": results}, f, indent=2)
    print(json.dumps({"status": "ok" if ok else "FAILED",
                      "artifacts": len(results)}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
