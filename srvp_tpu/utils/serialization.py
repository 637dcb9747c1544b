"""Pytree <-> npz serialization.

Checkpoints are flat npz archives keyed by pytree key-paths — a portable,
dependency-light format (no pickle, no torch). Loading requires a template
pytree with the same structure (the usual JAX restore pattern).
"""

import zipfile

import numpy as np

import jax
import jax.numpy as jnp


def tree_to_dict(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def save_npz(path, tree, compresslevel=1):
    """Writes the standard npz layout (np.load-compatible) with a
    configurable deflate level. np.savez_compressed pins zlib level 6,
    which costs ~20 s on a full KTH train state; float tensors barely
    compress past level 1, so level 1 is the default (~4x faster, a few %
    larger). `compresslevel=0` stores uncompressed."""
    method = zipfile.ZIP_DEFLATED if compresslevel else zipfile.ZIP_STORED
    kwargs = {"compresslevel": compresslevel} if compresslevel else {}
    with zipfile.ZipFile(path, "w", method, allowZip64=True, **kwargs) as zf:
        for key, arr in tree_to_dict(tree).items():
            with zf.open(key + ".npy", "w", force_zip64=True) as f:
                # NOT ascontiguousarray: it promotes 0-d scalars (step) to 1-d
                np.lib.format.write_array(f, np.asarray(arr, order="C"),
                                          allow_pickle=False)


def load_npz(path, template):
    """Loads an npz checkpoint into the structure of `template`."""
    with np.load(path) as arc:
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, leaf in flat:
            key = jax.tree_util.keystr(p)
            if key not in arc:
                raise KeyError(f"checkpoint {path} is missing '{key}'")
            leaves.append(jnp.asarray(arc[key], dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
