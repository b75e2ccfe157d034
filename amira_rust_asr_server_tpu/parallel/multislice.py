"""Multi-slice (DCN-aware) mesh placement and session routing.

Single-slice TP/DP ride ICI. Spanning multiple TPU slices adds DCN —
orders of magnitude less bandwidth than ICI — between slice boundaries,
so the axis with the least communication volume must be the one that
crosses slices (the scaling-book recipe). For this framework that axis
is always DATA:

- **Serving**: parameters replicate per slice, TP collectives stay
  inside a slice, and nothing at all crosses DCN at inference time —
  only request routing does, before any device work starts.
- **Training**: only the per-step gradient all-reduce crosses DCN
  (one [params] reduction per step vs per-layer TP collectives).

:func:`make_multislice_mesh` returns a standard ``(data, model)``
``Mesh`` whose device grid is ordered so that NO model-axis row crosses
a slice boundary and the data axis enumerates slices in contiguous
blocks — the placement property that keeps GSPMD's TP collectives on
ICI. Every existing sharding helper (``make_param_shardings``,
``data_sharding``, ``shard_params``, ``make_train_step``) applies
unchanged: multi-slice is a *placement* policy, not a new programming
model.

:class:`SliceRouter` is the host-side half: a new session is pinned to
the slice with the most free lanes and lives there until it ends, so
per-chunk streaming traffic never crosses DCN.

Reference parity note: the reference scales by stateless replicas
behind an external load balancer (README.md:491-549, nginx scale-out in
its compose); the slice router is that story made topology-aware inside
the framework instead of outside it.

Real multi-slice hardware is not reachable in this environment; the
placement logic is validated on the virtual CPU mesh by simulating
slice boundaries (``n_slices=...``) and asserting both the containment
invariant and numerical equality with the single-device math
(tests/test_multislice.py).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import DATA_AXIS, MODEL_AXIS


def slice_groups(devices: Optional[Sequence[jax.Device]] = None,
                 n_slices: Optional[int] = None
                 ) -> List[List[jax.Device]]:
    """Group devices by TPU slice.

    On real multi-slice hardware the grouping comes from each device's
    ``slice_index``. ``n_slices`` overrides it by splitting the device
    list into equal contiguous blocks — the simulation hook for the
    virtual CPU mesh (whose devices carry no slice topology).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_slices is None:
        by: Dict[int, List[jax.Device]] = {}
        for d in devices:
            by.setdefault(int(getattr(d, "slice_index", 0) or 0),
                          []).append(d)
        return [by[k] for k in sorted(by)]
    if n_slices < 1 or len(devices) % n_slices != 0:
        raise ValueError(
            f"{len(devices)} devices do not split into {n_slices} slices")
    per = len(devices) // n_slices
    return [devices[i * per:(i + 1) * per] for i in range(n_slices)]


def make_multislice_mesh(tp: int = 1,
                         devices: Optional[Sequence[jax.Device]] = None,
                         n_slices: Optional[int] = None) -> Mesh:
    """``(data, model)`` mesh whose model axis never crosses a slice.

    ``tp`` devices per model row, rows drawn from one slice at a time;
    the data axis is therefore ``n_slices * (slice_size // tp)`` long
    with each slice occupying a contiguous block of rows (DP across DCN,
    TP within ICI).
    """
    groups = slice_groups(devices, n_slices)
    rows: List[List[jax.Device]] = []
    for gi, g in enumerate(groups):
        if tp < 1 or len(g) % tp != 0:
            raise ValueError(
                f"slice {gi} has {len(g)} devices, not divisible by "
                f"tp={tp}")
        for r in range(len(g) // tp):
            rows.append(g[r * tp:(r + 1) * tp])
    grid = np.empty((len(rows), tp), dtype=object)
    for i, row in enumerate(rows):
        for j, d in enumerate(row):
            grid[i, j] = d
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def assert_ici_contained(mesh: Mesh,
                         groups: Optional[List[List[jax.Device]]] = None
                         ) -> None:
    """Raise if any model-axis row of ``mesh`` spans two slices.

    ``groups`` supplies the simulated slice membership when devices have
    no ``slice_index`` (CPU mesh); with real TPU devices it defaults to
    the hardware topology. Used by tests and the multi-chip dryrun as
    the executable statement of the placement invariant.
    """
    if groups is None:
        groups = slice_groups(list(mesh.devices.flat))
    of: Dict[int, int] = {}
    for gi, g in enumerate(groups):
        for d in g:
            of[id(d)] = gi
    grid = np.asarray(mesh.devices, dtype=object)
    if mesh.axis_names != (DATA_AXIS, MODEL_AXIS):
        raise ValueError(f"expected ({DATA_AXIS}, {MODEL_AXIS}) mesh, "
                         f"got {mesh.axis_names}")
    for i in range(grid.shape[0]):
        slices = {of[id(d)] for d in grid[i]}
        if len(slices) > 1:
            raise AssertionError(
                f"model row {i} crosses slices {sorted(slices)} — TP "
                f"collectives would ride DCN")


def slice_of_row(mesh: Mesh,
                 groups: Optional[List[List[jax.Device]]] = None
                 ) -> List[int]:
    """Slice id of each data-axis row (the router's placement table)."""
    if groups is None:
        groups = slice_groups(list(mesh.devices.flat))
    of = {id(d): gi for gi, g in enumerate(groups) for d in g}
    grid = np.asarray(mesh.devices, dtype=object)
    return [of[id(grid[i, 0])] for i in range(grid.shape[0])]


class SliceRouter:
    """Least-loaded slice placement for streaming sessions.

    Sessions are sticky: assigned once, released on close; per-chunk
    work then stays on one slice's ICI domain. Thread-safe (the server's
    session threads assign/release concurrently).
    """

    def __init__(self, n_slices: int, lanes_per_slice: int):
        if n_slices < 1 or lanes_per_slice < 1:
            raise ValueError("n_slices and lanes_per_slice must be >= 1")
        self.n_slices = n_slices
        self.lanes_per_slice = lanes_per_slice
        self._lock = threading.Lock()
        self._load = [0] * n_slices
        self._of: Dict[str, int] = {}

    def assign(self, session_id: str) -> Optional[int]:
        """Pin ``session_id`` to the least-loaded slice; None when every
        slice is at capacity (caller sheds with 503, like the lane
        engine's admission)."""
        with self._lock:
            if session_id in self._of:
                return self._of[session_id]
            s = min(range(self.n_slices), key=lambda i: self._load[i])
            if self._load[s] >= self.lanes_per_slice:
                return None
            self._load[s] += 1
            self._of[session_id] = s
            return s

    def release(self, session_id: str) -> None:
        with self._lock:
            s = self._of.pop(session_id, None)
            if s is not None:
                self._load[s] -= 1

    def to_dict(self) -> dict:
        with self._lock:
            return {"n_slices": self.n_slices,
                    "lanes_per_slice": self.lanes_per_slice,
                    "load": list(self._load),
                    "sessions": len(self._of)}
