"""Multi-host (multi-process) training/serving wiring.

The reference scales across hosts with stateless replicas behind a load
balancer (ref: README.md:491-549) — no cross-host compute. Here multi-host
is first-class: ``jax.distributed`` joins N processes into one global
device set, the mesh spans all hosts, and pjit/GSPMD inserts ICI/DCN
collectives (SURVEY.md §2.9 TPU-native mapping). On TPU pods this module
is driven with the ambient TPU topology; CI exercises it with 2 CPU
processes x 4 virtual devices each (tests/test_multihost.py and the
driver's ``dryrun_multihost`` entry).

Key multi-process correctness rules encoded here:
- every process builds identical host values (same seed) and materializes
  GLOBAL arrays via ``jax.make_array_from_callback`` so each process only
  touches its addressable shards — never device_put onto non-addressable
  devices;
- outputs asserted on must be replicated (the loss), so every process can
  read them without cross-host gathers.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """Join the jax distributed runtime (idempotent per process)."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def place_global(tree, shardings):
    """Materialize a host pytree (identical on every process) as GLOBAL
    sharded arrays, filling only this process's addressable shards."""
    import jax

    def one(x, sh):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    return jax.tree_util.tree_map(one, tree, shardings)


def run_multihost_smoke(process_id: int, num_processes: int,
                        coordinator: str,
                        model_ax: Optional[int] = None) -> float:
    """One sharded train step over the global (multi-process) mesh;
    returns the (replicated) loss. Prints a parseable OK line."""
    import jax
    import jax.numpy as jnp

    init_distributed(coordinator, num_processes, process_id)
    n_devices = len(jax.devices())
    assert n_devices >= num_processes, "global device set incomplete"

    from ..models import Transducer
    from .mesh import data_sharding, make_mesh, make_param_shardings
    from .train import TrainBatch, make_optimizer, make_train_step

    model = Transducer.from_preset("tiny")
    if model_ax is None:
        model_ax = 2 if n_devices % 2 == 0 else 1
    data_ax = n_devices // model_ax
    mesh = make_mesh({"data": data_ax, "model": model_ax})

    # identical init on every process, then shard globally
    params_host = model.init(jax.random.PRNGKey(0))
    p_sh = make_param_shardings(mesh, params_host)
    params = place_global(params_host, p_sh)

    from jax.sharding import NamedSharding

    from .mesh import replicated

    optimizer = make_optimizer(lr=1e-3)
    opt_state = optimizer.init(params)  # moments follow params' shardings

    def fix(x):
        # scalars (adam count) come out single-device; replicate globally
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return x
        return place_global(jax.device_get(x), replicated(mesh))

    opt_state = jax.tree_util.tree_map(fix, opt_state)

    step = make_train_step(model, optimizer, mesh)(params, opt_state)

    rng = np.random.default_rng(0)
    b, n, u = max(2, data_ax), 3200, 4
    batch_host = TrainBatch(
        audio=(rng.standard_normal((b, n)) * 0.1).astype(np.float32),
        audio_lens=np.full((b,), n, np.int32),
        labels=rng.integers(0, model.config.blank_id, (b, u)).astype(
            np.int32),
        label_lens=np.full((b,), u, np.int32))
    b_sh = TrainBatch(audio=data_sharding(mesh, 2),
                      audio_lens=data_sharding(mesh, 1),
                      labels=data_sharding(mesh, 2),
                      label_lens=data_sharding(mesh, 1))
    batch = place_global(batch_host, b_sh)

    params, opt_state, loss = step(params, opt_state, batch)
    loss_val = float(jax.device_get(loss))
    assert np.isfinite(loss_val), f"non-finite loss {loss_val}"
    print(f"multihost proc {process_id}/{num_processes}: "
          f"mesh=({data_ax}x{model_ax}) devices={n_devices} "
          f"loss={loss_val:.4f} OK", flush=True)
    return loss_val
