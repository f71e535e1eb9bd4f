"""Tensor-parallel parameter shardings for the transformer towers.

SURVEY §2c lists TP as the optional mesh axis for the ViT encoder.  The
recipe is GSPMD-native: annotate parameter shardings over the ``model`` axis
(MLP hidden dim, packed-QKV output dim, attention output input-dim) and let
XLA propagate activation shardings and insert the all-reduces over ICI.

Rules cover both the scanned tower layout (leading layer axis from nn.scan)
and unrolled layers; everything not matched stays replicated.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path: Tuple) -> str:
    return "/".join(str(getattr(p, "key", "")) for p in path)


def tp_spec(path: Tuple, leaf: Any) -> P:
    """PartitionSpec for one parameter leaf under the ``model`` axis."""
    name = _path_str(path)
    ndim = getattr(leaf, "ndim", 0)

    def last_axis():
        return P(*([None] * (ndim - 1) + ["model"]))

    def second_last_axis():
        if ndim < 2:
            return P()
        return P(*([None] * (ndim - 2) + ["model", None]))

    if "mlp_c_fc" in name or "mlp_fc1" in name:
        # column-parallel: hidden dim sharded (kernel last axis, bias last)
        return last_axis()
    if "mlp_c_proj" in name or "mlp_fc2" in name:
        # row-parallel: contraction dim sharded; bias replicated
        if name.endswith("kernel"):
            return second_last_axis()
        return P()
    if "attn/in_proj" in name or "attn/qkv" in name:
        return last_axis()
    if ("attn/out_proj" in name or "attn/proj" in name) and name.endswith("kernel"):
        return second_last_axis()
    return P()


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """device_put every parameter with its TP sharding over ``mesh``."""

    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, tp_spec(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)
