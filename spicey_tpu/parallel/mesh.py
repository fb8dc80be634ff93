"""Device-mesh sharding for batched sweeps.

The reference is single-threaded with no distributed anything (SURVEY.md §5);
the meaningful multi-chip axes for a circuit simulator are the
embarrassingly-parallel ones: Monte-Carlo ``batch`` (the data-parallel
analog) and the AC ``freq`` grid. Sharding is pure jax.sharding — arrays are
placed with NamedSharding over a Mesh and XLA inserts the (trivial: none
until the final gather) collectives over ICI. The compiled scan/solve cores
are unchanged: sharding is a placement concern, not a code-path concern.

Typical use:
    mesh = make_mesh()                             # all devices on 'batch'
    res = simulate_ac_batch(net, overrides, device_put=sharder(mesh))
or a 2D layout for AC sweeps:
    mesh = make_mesh(axes={"batch": 4, "freq": 2})
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a Mesh. Default: 1D ('batch',) over all default-backend devices."""
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {"batch": len(devices)}
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh axes {axes} need {int(np.prod(shape))} devices, "
            f"got {len(devices)}"
        )
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes.keys()))


def sharder(mesh: Mesh):
    """Return a device_put callable for the batch APIs.

    The callable maps (array, axes) -> array placed with
    NamedSharding(mesh, P(*axes)), where axes entries name mesh axes or are
    None for replicated dimensions. Axes not present in the mesh degrade to
    replication, so the same call sites work on 1D and 2D meshes.
    """
    def put(arr, axes):
        spec = tuple(a if (a in mesh.axis_names) else None for a in axes)
        return jax.device_put(arr, NamedSharding(mesh, P(*spec)))

    # the MC fast paths wrap their Pallas kernels in shard_map (a
    # pallas_call is not GSPMD-auto-partitionable), which needs the Mesh
    # itself, not just a placement callable
    put.mesh = mesh
    return put
