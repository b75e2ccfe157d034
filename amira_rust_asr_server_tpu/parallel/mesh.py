"""Device mesh construction and sharding rules.

The reference has no model parallelism — its scaling story is stateless
replicas behind a load balancer (SURVEY.md §2.9, ref README.md:491-549).
Here sharding is first-class: a ``jax.sharding.Mesh`` with ``data`` and
``model`` axes; parameters are tensor-sharded over ``model`` (the TP
analogue of megatron-style column/row splits, expressed declaratively and
realized by GSPMD collectives over ICI), activations are batch-sharded
over ``data``. There is no hand-written communication backend — the XLA
partitioner inserts all_reduce/all_gather/reduce_scatter.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh. ``shape`` maps axis name -> size; None/{} = all devices
    on the data axis (pure DP)."""
    devices = list(devices if devices is not None else jax.devices())
    if not shape:
        shape = {DATA_AXIS: len(devices), MODEL_AXIS: 1}
    sizes = [shape.get(DATA_AXIS, 1), shape.get(MODEL_AXIS, 1)]
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices, have {len(devices)}")
    grid = np.array(devices[:n]).reshape(sizes)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def param_spec(path: str, leaf) -> P:
    """Tensor-parallel PartitionSpec for one parameter leaf.

    Heuristics (megatron-style):
    - embeddings [V, E]: shard vocab rows over model
    - LSTM gate weights [in+h, 4h]: shard gate (output) dim
    - attention qkv / FF up projections [d, k*d]: shard output dim (column)
    - output projections back to d_model [k*d, d]: shard input dim (row)
    - joint output [j, V]: shard vocab dim
    - biases, norms, small vectors: replicated
    """
    ndim = getattr(leaf, "ndim", 0)
    if ndim < 2:
        return P()
    shape = leaf.shape
    name = path.lower()
    if "embed" in name:
        return P(MODEL_AXIS, None)
    # MoE ff2 expert stacks [E, d, f]/[E, f, d]/[E, f]: shard the expert
    # dim over model = expert parallelism (encoder.MoEFeedForward)
    if "ff2" in name and ndim == 3:
        return P(MODEL_AXIS, None, None)
    if "ff2" in name and ndim == 2 and (
            name.endswith("b1") or name.endswith("b2")):
        return P(MODEL_AXIS, None)
    if ndim == 2:
        d_in, d_out = shape[-2], shape[-1]
        if d_out >= d_in:        # column-parallel (up/qkv/gates/out-vocab)
            return P(None, MODEL_AXIS)
        return P(MODEL_AXIS, None)  # row-parallel (down projections)
    if ndim == 3:
        # conv kernels [width, in, out]: shard out channels
        return P(None, None, MODEL_AXIS)
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def make_param_shardings(mesh: Mesh, params, fsdp: bool = False):
    """Tree of NamedSharding for a parameter pytree.

    A spec axis is dropped (replicated) when the dimension doesn't divide
    evenly by the mesh axis — correctness first, performance where shapes
    allow. Pad dims to multiples of the mesh in model configs for full TP.

    ``fsdp=True`` additionally shards each parameter over the ``data``
    axis (ZeRO-3 / fully-sharded data parallel, GSPMD-style): the largest
    dim not already TP-sharded is partitioned over ``data``; XLA inserts
    the all-gather before each use and reduce-scatters the grads. Params
    and optimizer moments then cost 1/data_size HBM per chip.
    """
    model_size = mesh.shape[MODEL_AXIS]
    data_size = mesh.shape[DATA_AXIS]

    def one(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        spec = param_spec(_path_str(path), leaf)
        fixed = [None] * ndim
        for dim, ax in enumerate(spec):
            if ax == MODEL_AXIS and leaf.shape[dim] % model_size == 0:
                fixed[dim] = ax
        if fsdp and data_size > 1:
            for dim in sorted(range(ndim), key=lambda d: -leaf.shape[d]):
                if fixed[dim] is None and leaf.shape[dim] % data_size == 0:
                    fixed[dim] = DATA_AXIS
                    break
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(one, params)


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Batch-axis sharding for inputs/activations."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params, fsdp: bool = False):
    """Place a parameter pytree onto the mesh with TP (+FSDP) shardings."""
    shardings = make_param_shardings(mesh, params, fsdp=fsdp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings)
