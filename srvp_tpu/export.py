"""Ahead-of-time serving export: a trained SRVP predictor as one portable
StableHLO artifact.

The reference has no deployment story — its checkpoints can only be
consumed by the torch test protocol (/root/reference/test.py:196-204). The
TPU-native equivalent of "a servable model" is `jax.export`: the jitted
generation function is lowered ONCE, with the trained weights baked in as
constants, to versioned StableHLO that any later JAX runtime (or a non-JAX
PJRT host) can load and call without the model code, the checkpoint, or a
re-trace. Properties:

  * **Self-contained**: one file = weights + program + shape contract.
  * **Batch-polymorphic**: exported with a symbolic batch dimension, so one
    artifact serves any request batch size (shapes stay static per call —
    XLA compiles per concrete batch on first use, as usual).
  * **Multi-platform**: lowered for BOTH tpu and cpu by default, so the
    artifact produced on a TPU host also runs in a CPU canary/CI.

Serving call contract (uint8 in, uint8 out — no float preprocessing on the
client):

    frames = f(x_cond, seed)
      x_cond: uint8 (nt_cond, B, H, W, C) conditioning frames
      seed:   int32 scalar; independent noise per batch row
      frames: uint8 (nt_gen, B, H, W, C) — reconstructed conditioning
              frames + prediction, the reference protocol's frame indexing.

File format: 8-byte magic 'SRVPEXP1' | u32 header length | JSON header
(model dims + horizon + export metadata) | serialized jax.export blob.
"""

import json
import os
import struct

import jax
import jax.numpy as jnp

MAGIC = b"SRVPEXP1"


def make_serving_fn(cfg, params, bn_state, nt_gen, *, oversampling=1,
                    compute_dtype=jnp.bfloat16):
    """The pure generation function with weights closed over (they become
    constants in the exported program). Eval-mode forward: content from the
    last nt_inf conditioning frames, latent rollout to nt_gen."""
    from srvp_tpu.models import srvp

    def serve(x_cond, seed):
        x = x_cond.astype(jnp.float32) / 255.0
        rng = jax.random.PRNGKey(seed)
        out = srvp.forward(cfg, params, bn_state, x, nt_gen,
                           oversampling=oversampling, rng=rng, train=False,
                           compute_dtype=compute_dtype)
        x_ = jnp.clip(out.x_.astype(jnp.float32), 0.0, 1.0)
        return jnp.round(x_ * 255.0).astype(jnp.uint8)

    return serve


def export_serving(cfg, params, bn_state, nt_cond, nt_gen, *,
                   oversampling=1, compute_dtype=jnp.bfloat16,
                   platforms=("tpu", "cpu"), batch_size=None):
    """Lowers the serving function to a serialized artifact (bytes).

    batch_size=None exports a symbolic batch dimension ('b'); an int pins
    it (use if a future model change breaks shape polymorphism — the test
    suite locks the polymorphic path for the current model)."""
    from jax import export as jexport

    serve = make_serving_fn(cfg, params, bn_state, nt_gen,
                            oversampling=oversampling,
                            compute_dtype=compute_dtype)
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch_size
    x_spec = jax.ShapeDtypeStruct((nt_cond, b, cfg.nx, cfg.nx, cfg.nc),
                                  jnp.uint8)
    seed_spec = jax.ShapeDtypeStruct((), jnp.int32)
    exp = jexport.export(jax.jit(serve), platforms=list(platforms))(
        x_spec, seed_spec)
    header = {
        "format": "srvp-tpu serving export v1",
        "nt_cond": int(nt_cond),
        "nt_gen": int(nt_gen),
        "nx": int(cfg.nx), "nc": int(cfg.nc),
        "oversampling": int(oversampling),
        "compute_dtype": jnp.dtype(compute_dtype).name,
        "platforms": list(platforms),
        "batch": "symbolic" if batch_size is None else int(batch_size),
        "calling_convention": "f(x_cond uint8 (nt_cond,B,H,W,C), "
                              "seed int32[]) -> uint8 (nt_gen,B,H,W,C)",
    }
    hdr = json.dumps(header).encode()
    return MAGIC + struct.pack("<I", len(hdr)) + hdr + exp.serialize()


def save_serving(path, blob):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_serving(path):
    """Loads an exported artifact; returns (fn, header).

    fn(x_cond, seed) executes the deserialized program via jax on the
    current default platform (must be one of the header's `platforms`)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    if blob[:8] != MAGIC:
        raise ValueError(f"{path}: not a srvp-tpu serving export "
                         f"(bad magic {blob[:8]!r})")
    (hlen,) = struct.unpack("<I", blob[8:12])
    header = json.loads(blob[12:12 + hlen].decode())
    exp = jexport.deserialize(bytearray(blob[12 + hlen:]))

    def fn(x_cond, seed):
        return exp.call(jnp.asarray(x_cond, dtype=jnp.uint8),
                        jnp.asarray(seed, dtype=jnp.int32))

    return fn, header


def export_from_xp_dir(xp_dir, *, model_name="model_best.npz", nt_cond=None,
                       nt_gen=None, oversampling=None, platforms=("tpu", "cpu"),
                       batch_size=None, out=None):
    """CLI half: load config.json + checkpoint the way test.py does, export,
    write <xp_dir>/serving.srvpexp (or `out`). Returns the output path."""
    from srvp_tpu.helper import DotDict, load_json
    from srvp_tpu.models import srvp
    from srvp_tpu.train_main import model_config
    from srvp_tpu.utils import checkpoint as ckpt

    config = DotDict(load_json(os.path.join(xp_dir, "config.json")))
    cfg = model_config(config)
    model_path = os.path.join(xp_dir, model_name)
    if model_name.endswith(".pt"):
        from srvp_tpu.utils.torch_convert import load_torch_checkpoint
        params, bn_state = load_torch_checkpoint(model_path, cfg)
    else:
        tmpl_p, tmpl_s = srvp.init(jax.random.PRNGKey(0), cfg)
        params, bn_state = ckpt.load_model(model_path, tmpl_p, tmpl_s)
    nt_cond = nt_cond or config.nt_cond
    nt_gen = nt_gen or config.get("seq_len_test") or config.seq_len
    oversampling = oversampling or config.n_euler_steps
    precision = config.get("precision", "float32")
    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    blob = export_serving(cfg, params, bn_state, nt_cond, nt_gen,
                          oversampling=oversampling,
                          compute_dtype=compute_dtype,
                          platforms=platforms, batch_size=batch_size)
    out = out or os.path.join(xp_dir, "serving.srvpexp")
    save_serving(out, blob)
    return out
