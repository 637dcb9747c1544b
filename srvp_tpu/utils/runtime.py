"""Runtime utilities: persistent compilation cache, structured metric logs.

First TPU compilation of the full train step is ~1-3 minutes; the persistent
cache makes every subsequent process start instantly (SURVEY.md §5 tracing/
observability upgrades — the reference has none of this).
"""

import json
import os
import time


def honor_jax_platforms_env():
    """Re-asserts an explicit JAX_PLATFORMS env var over platform plugins.

    Some platform plugins (e.g. the tunneled axon TPU plugin) register
    themselves over the env var, so `JAX_PLATFORMS=cpu python train.py`
    would silently grab the TPU anyway. An explicit user choice must win;
    tests/conftest.py applies the same recipe."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)


def compiler_options_from_env():
    """Optional per-compile XLA compiler options from SRVP_COMPILER_OPTIONS.

    Format: JSON object, e.g. '{"xla_tpu_scoped_vmem_limit_kib": 65536}'.
    JSON types are preserved: PJRT option parsing is typed (a bool option
    rejects the string "false"), so booleans/ints must arrive as such.
    Returns None when unset (the common case — jax.jit(compiler_options=None)
    is the default behavior).

    Why this channel and not XLA_FLAGS: under the tunneled axon TPU platform
    the *local* XLA client parses XLA_FLAGS and aborts on TPU-only flags it
    does not know (parse_flags_from_env.cc fatal); per-compile
    compiler_options travel through PJRT to the remote TPU compiler instead
    (verified working on hardware). Used by scripts/sweep_xla_flags.py and
    available for production tuning.
    """
    raw = os.environ.get("SRVP_COMPILER_OPTIONS")
    if not raw:
        return None
    opts = json.loads(raw)
    if not isinstance(opts, dict):
        raise ValueError(
            f"SRVP_COMPILER_OPTIONS must be a JSON object, got: {raw!r}")
    return opts


def setup_compilation_cache(cache_dir=None):
    """Enables JAX's persistent compilation cache (idempotent); also makes
    an explicit JAX_PLATFORMS env choice stick (every CLI entry point calls
    this first)."""
    honor_jax_platforms_env()
    import jax
    cache_dir = cache_dir or os.environ.get(
        "SRVP_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "srvp_tpu_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"compilation cache disabled: {e}")
    return cache_dir


class MetricsLogger:
    """Append-only JSONL metrics stream (step-structured observability).

    `truncate_after` drops rows past a resumed checkpoint step: an ungraceful
    death between checkpoints leaves rows with no matching state, and --resume
    would otherwise append a contradictory second copy of those steps.
    """

    def __init__(self, path, truncate_after=None):
        self.path = path
        if truncate_after is not None and os.path.exists(path):
            kept, dropped = [], 0
            with open(path) as f:
                for line in f:
                    try:
                        step = json.loads(line)["step"]
                    except (ValueError, KeyError):
                        dropped += 1  # half-written trailing line
                        continue
                    if step <= truncate_after:
                        kept.append(line)
                    else:
                        dropped += 1
            if dropped:
                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    f.writelines(kept)
                os.replace(tmp, path)
                print(f"metrics.jsonl: dropped {dropped} row(s) past resumed "
                      f"step {truncate_after}")
        self._f = open(path, "a", buffering=1)
        self._t0 = time.time()

    def log(self, step, **metrics):
        rec = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()
