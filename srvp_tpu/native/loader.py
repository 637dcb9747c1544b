"""Build-on-demand loader for the native C++ data engine.

The shared library is compiled from native/*.cpp on first use (g++ -O3) and
cached next to this module; everything degrades gracefully to the pure-Python
paths when no compiler is available.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRCS = [os.path.join(_REPO_ROOT, "native", f)
         for f in ("mmnist_gen.cpp", "png_decode.cpp")]
_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_srvp_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


_CXXFLAGS = ["-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread"]


def _host_fingerprint():
    """-march=native makes the cached .so host-specific: a checkout copied
    to an older CPU would SIGILL mid-run instead of rebuilding. Key the
    cache on the compile flags + the host's CPU feature flags."""
    cpu = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    cpu = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform
        cpu = platform.machine()
    import hashlib
    return hashlib.sha256(
        (" ".join(_CXXFLAGS) + "|" + cpu).encode()).hexdigest()


def _build():
    cmd = ["g++"] + _CXXFLAGS + _SRCS + [
        "-lpng", "-lz", "-ldeflate", "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)
    with open(_LIB_PATH + ".buildinfo", "w") as f:
        f.write(_host_fingerprint())


def get_native_lib():
    """Returns the ctypes library or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            info = _LIB_PATH + ".buildinfo"
            stale = not os.path.exists(_LIB_PATH) or any(
                os.path.exists(s)
                and os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
                for s in _SRCS) or (
                not os.path.exists(info)
                or open(info).read() != _host_fingerprint())
            if stale:
                try:
                    _build()
                except Exception:
                    if not os.path.exists(_LIB_PATH):
                        raise
                    # no compiler but a prebuilt .so exists: use it (likely
                    # built on this host; the fingerprint guards the
                    # copied-checkout case when a compiler IS available)
                    print("srvp_tpu native engine: rebuild failed, "
                          "using existing prebuilt library")
            lib = ctypes.CDLL(_LIB_PATH)
            lib.mmnist_generate_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int,
            ]
            lib.mmnist_generate_batch.restype = None
            lib.mmnist_parts_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ]
            lib.mmnist_parts_batch.restype = None
            try:
                lib.srvp_png_decode_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int,
                ]
                lib.srvp_png_decode_batch.restype = ctypes.c_int
                lib.srvp_png_decode_batch_offsets.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ]
                lib.srvp_png_decode_batch_offsets.restype = ctypes.c_int
            except Exception:
                # pre-existing .so built before the PNG decoder existed and
                # no compiler available to refresh it
                lib.srvp_png_decode_batch = None
                lib.srvp_png_decode_batch_offsets = None
            _lib = lib
        except Exception as e:
            print(f"srvp_tpu native engine unavailable ({e}); "
                  "falling back to Python data generation")
            _lib = None
        return _lib


class _DigitPack:
    """Digit images flattened for the C API (cached per dataset)."""

    def __init__(self, digits):
        self.n = len(digits)
        self.offsets = np.zeros(self.n, np.int64)
        self.hw = np.zeros((self.n, 2), np.int32)
        chunks = []
        off = 0
        for i, d in enumerate(digits):
            d = np.ascontiguousarray(d, np.uint8)
            self.offsets[i] = off
            self.hw[i] = d.shape
            chunks.append(d.reshape(-1))
            off += d.size
        self.data = np.concatenate(chunks)


_pack_cache = {}


def _get_pack(digits, frame_size):
    """Single-entry digit-pack cache. The value keeps a STRONG reference to
    the digits object and the hit path compares identity, so a recycled
    id() after garbage collection can never serve another dataset's digit
    images; guarded by the module lock for loader worker threads. Raises
    ValueError (numpy randint parity) when a digit exceeds the frame."""
    with _lock:
        entry = _pack_cache.get("pack")
        if entry is None or entry[0] is not digits:
            entry = (digits, _DigitPack(digits))
            _pack_cache["pack"] = entry
    pack = entry[1]
    if (pack.hw > frame_size).any():
        raise ValueError(
            f"digit images up to {pack.hw.max()}px do not fit the "
            f"{frame_size}px frame (numpy randint would raise low >= high)")
    return pack


def mmnist_generate_batch(digits, frame_size, seq_len, max_speed,
                          deterministic, num_digits, seeds, n_threads=4):
    """Generates a batch of Moving MNIST videos natively.

    Returns (batch, seq_len, H, W) uint8, bit-identical to the Python path
    seeded with np.random.RandomState(seed) per item. None if the native
    library is unavailable.
    """
    lib = get_native_lib()
    if lib is None:
        return None
    pack = _get_pack(digits, frame_size)
    seeds = np.ascontiguousarray(seeds, np.uint32)
    batch = len(seeds)
    out = np.empty((batch, seq_len, frame_size, frame_size), np.uint8)
    lib.mmnist_generate_batch(
        pack.data.ctypes.data, pack.offsets.ctypes.data, pack.hw.ctypes.data,
        pack.n, frame_size, seq_len, max_speed, int(deterministic),
        num_digits, seeds.ctypes.data, batch, out.ctypes.data, n_threads)
    return out


def mmnist_parts_batch(digits, frame_size, seq_len, max_speed, deterministic,
                       num_digits, seeds, n_threads=4):
    """Native batch of (digit images, trajectories) for on-device
    compositing; same draws as mmnist_generate_batch. Returns
    (digits (B, D, h, w) uint8, pos (B, D, T, 2) int32) or None.
    Requires uniformly-shaped digit images."""
    lib = get_native_lib()
    if lib is None:
        return None
    pack = _get_pack(digits, frame_size)
    if not (pack.hw == pack.hw[0]).all():
        return None
    dh, dw = int(pack.hw[0][0]), int(pack.hw[0][1])
    seeds = np.ascontiguousarray(seeds, np.uint32)
    batch = len(seeds)
    digits_out = np.empty((batch, num_digits, dh, dw), np.uint8)
    pos_out = np.empty((batch, num_digits, seq_len, 2), np.int32)
    lib.mmnist_parts_batch(
        pack.data.ctypes.data, pack.offsets.ctypes.data, pack.hw.ctypes.data,
        pack.n, frame_size, seq_len, max_speed, int(deterministic),
        num_digits, seeds.ctypes.data, batch, dh, dw,
        digits_out.ctypes.data, pos_out.ctypes.data, n_threads)
    return digits_out, pos_out


_warned_pil_fallback = False


def _pil_decode_into(paths, out, channels, place):
    """PIL-parity fallback when the native decoder rejects a file (e.g. a
    JPEG misnamed *.png — PIL sniffs content, the native path checks the
    PNG signature). `place(i)` returns the (h, w[, c]) destination view for
    path i. Reproduces the per-item paths' exact semantics:
    np.array(Image.open(p)) with [:, :, 0] for channels == 1 color files."""
    global _warned_pil_fallback
    from PIL import Image
    if not _warned_pil_fallback:
        _warned_pil_fallback = True
        print("srvp_tpu native PNG decode: falling back to PIL for a batch "
              "with non-PNG or unsupported files")
    for i, p in enumerate(paths):
        a = np.array(Image.open(p))
        if channels == 1 and a.ndim == 3:
            a = a[:, :, 0]
        place(i)[...] = a.reshape(place(i).shape)


def decode_png_batch(paths, h, w, channels, n_threads=4):
    """Decodes a list of PNG file paths natively into (N, h, w, channels)
    uint8 (channels == 1 drops the trailing axis: (N, h, w)).

    channels == 1 takes a color file's RED channel — the exact semantics of
    np.array(Image.open(p))[:, :, 0] in data/kth.py. Returns None if the
    native library is unavailable. A batch the native decoder rejects
    (non-PNG content, unsupported variant, wrong dimensions) falls back to
    PIL for parity with the per-item path; genuinely bad files then raise
    from PIL/reshape exactly as the pure-Python path would."""
    lib = get_native_lib()
    if lib is None or getattr(lib, "srvp_png_decode_batch", None) is None:
        return None
    n = len(paths)
    out = np.empty((n, h, w, channels), np.uint8)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    rc = lib.srvp_png_decode_batch(arr, n, out.ctypes.data, h, w, channels,
                                   max(1, n_threads))
    if rc:
        # PIL-parity fallback; a genuinely corrupt file raises from PIL
        # exactly as the pure-Python path would
        _pil_decode_into(paths, out, channels, lambda i: out[i])
    return out[..., 0] if channels == 1 else out


def decode_png_timemajor(paths, n_videos, seq_len, h, w, channels,
                         n_threads=4):
    """Decodes n_videos*seq_len frame files (video-major path order)
    DIRECTLY into the collated time-major batch layout: (T, B, h, w,
    channels) uint8 — no host-side re-stacking copy. Returns None when the
    native library is unavailable."""
    lib = get_native_lib()
    if lib is None \
            or getattr(lib, "srvp_png_decode_batch_offsets", None) is None:
        return None
    n = len(paths)
    if n != n_videos * seq_len:
        # must stay an unconditional error: the C decoder fills exactly n
        # frame slots of an uninitialized output tensor
        raise ValueError(
            f"{n} paths != n_videos*seq_len = {n_videos * seq_len}")
    frame_bytes = h * w * channels
    out = np.empty((seq_len, n_videos, h, w, channels), np.uint8)
    # path i = (b, t); destination block (t, b)
    b_idx, t_idx = np.divmod(np.arange(n, dtype=np.int64), seq_len)
    offsets = np.ascontiguousarray(
        (t_idx * n_videos + b_idx) * frame_bytes)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    rc = lib.srvp_png_decode_batch_offsets(
        arr, n, out.ctypes.data, offsets.ctypes.data, h, w, channels,
        max(1, n_threads))
    if rc:
        flat = out.reshape(-1)
        _pil_decode_into(
            paths, out, channels,
            lambda i: flat[offsets[i]:offsets[i] + frame_bytes].reshape(
                h, w, channels))
    return out
