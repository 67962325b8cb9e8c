"""Multi-host initialization + serving-mesh construction.

The reference reaches multiple hosts through its RPC fabric
(tools/rpc/rpc-server.cpp + ggml-rpc backend: one server process per remote
box, tensors shipped over sockets). The TPU-native shape is jax.distributed:
every host runs the SAME program, `jax.distributed.initialize` wires the
coordinator, and `jax.devices()` becomes the global device list so one
`jax.sharding.Mesh` spans hosts — collectives ride ICI inside a slice and
DCN across slices. No tensor ever moves through Python sockets.

Serving entry points (server/app.py --coordinator/--num-hosts, tools/cli.py)
call `init_multihost()` once before touching jax, then build the mesh with
`serving_mesh()`:

- pp (outermost) — pipeline stages; activations cross stages once per
  microbatch, so this is the axis to lay over DCN when multi-slice.
- dp — sequence/batch rows (continuous-batching slots).
- tp (innermost) — tensor parallel; all-reduce per layer, must stay on ICI.

`mesh_shape_hint` picks (dp, tp) for a device count when the user gives
none: tp fills the host-local chip count first (ICI), dp takes the rest.
"""

from __future__ import annotations

import os

import jax

from .mesh import make_mesh


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> bool:
    """Initialize jax.distributed when multi-host args (or the standard
    JAX_COORDINATOR_ADDRESS / cloud-TPU env) are present. Returns True if
    distributed mode is active. Safe to call once per process, BEFORE any
    other jax API touches the backend."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator is None and num_processes is None:
        return False  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def mesh_shape_hint(n_devices: int, n_local: int | None = None):
    """(dp, tp) for n_devices: tp = host-local chips (ICI all-reduce),
    dp = host count. A single host serves tp-only."""
    n_local = n_local or len(jax.local_devices())
    tp = min(n_local, n_devices)
    return max(n_devices // tp, 1), tp


def serving_mesh(dp: int = 0, tp: int = 0, pp: int = 1):
    """Build the serving mesh over the GLOBAL device list (all hosts).
    dp/tp of 0 = auto (mesh_shape_hint over the devices pp leaves)."""
    n = len(jax.devices())
    if n % max(pp, 1):
        raise ValueError(f"{n} devices not divisible by pp={pp}")
    avail = n // max(pp, 1)
    if not tp:
        dp_auto, tp = mesh_shape_hint(avail)
        dp = dp or dp_auto
    dp = dp or max(avail // tp, 1)
    return make_mesh(dp=dp, tp=tp, pp=pp)
