"""Parameter initialization without compiling the forward pass.

``model.init`` traces and runs the whole forward graph — a second
multi-minute compile for a 300M-parameter model under remote compilation.
For benchmarks and random-weight runs, derive the parameter tree shape with
``jax.eval_shape`` (zero FLOPs, no compile) and fill it with one small jitted
normal-sampling program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_by_shape(model, key, *args, scale: float = 0.02, **kwargs):
    shapes = jax.eval_shape(lambda k: model.init(k, *args, **kwargs), key)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def fill(k):
        ks = jax.random.split(k, len(leaves))
        out = []
        for kk, leaf in zip(ks, leaves):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                out.append(jax.random.normal(kk, leaf.shape, leaf.dtype) * scale)
            else:
                out.append(jnp.zeros(leaf.shape, leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, out)

    return fill(key)
