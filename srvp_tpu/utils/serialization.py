"""Pytree <-> npz serialization.

Checkpoints are flat npz archives keyed by pytree key-paths — a portable,
dependency-light format (no pickle, no torch). Loading requires a template
pytree with the same structure (the usual JAX restore pattern).
"""

import numpy as np

import jax
import jax.numpy as jnp


def tree_to_dict(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def save_npz(path, tree):
    np.savez_compressed(path, **tree_to_dict(tree))


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
