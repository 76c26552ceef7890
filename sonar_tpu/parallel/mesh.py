"""Device mesh + sharding rules for SONAR-TPU.

The reference has no distributed layer at all (SURVEY §2.4: no
torch.distributed/NCCL anywhere); scale-out here is new, TPU-native
capability following the standard JAX recipe: build a Mesh, annotate
parameter/data shardings with NamedSpec rules, jit, and let GSPMD insert the
collectives over ICI.

Axes:
- ``data``: batch-dimension data parallelism (encode fleets, training DP),
- ``model``: tensor parallelism over attention heads / FFN hidden dim /
  embedding vocab (Megatron-style column->row pairs; XLA inserts the psum).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if data == -1:
        assert len(devs) % model == 0, (len(devs), model)
        data = len(devs) // model
    if data * model != len(devs):
        devs = devs[: data * model]
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, ("data", "model"))


# -- parameter sharding rules -------------------------------------------------
#
# Rules keyed on (path suffix patterns). Layer-stacked leaves have a leading
# L axis, so kernels are [L, in, out] and biases [L, out]; frontend embeds
# are [V, D].

def _spec_for_path(path: str, ndim: int) -> P:
    def last_axes(*axes):
        """Pad spec with leading Nones so it applies to the trailing dims."""
        return P(*([None] * (ndim - len(axes)) + list(axes)))

    # Column-parallel: split output dim.
    if any(s in path for s in ("q_proj/kernel", "k_proj/kernel", "v_proj/kernel",
                               "inner_proj/kernel")):
        return last_axes(None, "model")
    if any(s in path for s in ("q_proj/bias", "k_proj/bias", "v_proj/bias",
                               "inner_proj/bias")):
        return last_axes("model")
    # Row-parallel: split input dim; XLA adds the psum on the matmul.
    if any(s in path for s in ("output_proj/kernel",)):
        return last_axes("model", None)
    # Embedding: shard the vocab dim (row-parallel gather + psum).
    if path.endswith("embed/weight") and ndim == 2:
        return P("model", None)
    return P()  # replicate LNs, output_proj bias, small tables


def param_shardings(params: dict, mesh: Mesh) -> Any:
    """Pytree of NamedSharding matching the TP rules above.

    Falls back to replication for any leaf whose sharded dimension is not
    divisible by the mesh axis size (e.g. odd toy vocab sizes).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        pstr = jax.tree_util.keystr(path, simple=True, separator="/")
        spec = _spec_for_path(pstr, np.ndim(leaf))
        shape = np.shape(leaf)
        for dim, axis in enumerate(spec):
            if axis is not None and shape[dim] % mesh.shape[axis] != 0:
                spec = P()
                break
        specs.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, specs)


def data_sharding(mesh: Mesh, *batch_axes_specs: Any) -> NamedSharding:
    if batch_axes_specs:
        return NamedSharding(mesh, P(*batch_axes_specs))
    return NamedSharding(mesh, P("data"))


@functools.lru_cache(maxsize=128)
def _identity_jit(shardings_flat, treedef):
    """Memoized jitted identity keyed on the (flattened) shardings tree.

    A fresh ``jax.jit(lambda t: t, ...)`` per call is a new PjitFunction:
    jit's trace cache never hits and every call pays retrace+lower even
    when tree/mesh are identical. NamedSharding and treedefs are hashable,
    so the jit instance (and with it the trace/compile cache) is reused
    across calls with the same shardings."""
    shardings = jax.tree_util.tree_unflatten(treedef, list(shardings_flat))
    return jax.jit(lambda t: t, out_shardings=shardings)


def _identity_put(tree, shardings):
    flat, treedef = jax.tree_util.tree_flatten(shardings)
    return _identity_jit(tuple(flat), treedef)(tree)


def shard_params(params: dict, mesh: Mesh) -> Any:
    """Place a host pytree onto the mesh according to the TP rules.

    Staged as ONE jitted identity program with per-leaf out_shardings:
    ``jax.device_put`` with a shardings tree compiles a separate tiny
    resharding program per distinct leaf shape (~27 for a toy model)."""
    return _identity_put(params, param_shardings(params, mesh))


def replicate(tree: Any, mesh: Mesh) -> Any:
    # One memoized jitted identity program for the whole tree (device_put
    # with a sharding compiles a tiny resharding program per leaf shape).
    sharding = NamedSharding(mesh, P())
    shardings = jax.tree_util.tree_map(lambda _: sharding, tree)
    return _identity_put(tree, shardings)
