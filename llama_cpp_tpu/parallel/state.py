"""Session-wide parallel execution plan.

The reference reaches its parallelism from the user-facing runtime (device
prep in src/llama.cpp:149-230; scheduler pipelining ggml-backend.cpp:1804).
This is the TPU analog: one process-global plan naming the active mesh and
which named axes carry expert / data / tensor parallelism. The model graph
(models/transformer.py moe_block) consults the plan at TRACE time, so a plan
change invalidates nothing — the next jit cache miss simply traces the new
dispatch.

Kept deliberately tiny: the mesh itself (jax.sharding.Mesh) already owns the
device topology; the plan only records intent.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass, replace

from jax.sharding import Mesh


@dataclass(frozen=True)
class ParallelPlan:
    mesh: Mesh | None = None
    ep_axis: str | None = None  # experts sharded dim-0 over this axis
    capacity_factor: float = 2.0  # ep_moe send-buffer headroom
    pp_axis: str | None = None  # layer stages sharded over this axis

    @property
    def ep(self) -> bool:
        return self.mesh is not None and self.ep_axis is not None

    @property
    def pp(self) -> bool:
        return self.mesh is not None and self.pp_axis is not None


_PLAN = ParallelPlan()


def get_plan() -> ParallelPlan:
    return _PLAN


def set_plan(mesh: Mesh | None = None, ep_axis: str | None = None,
             capacity_factor: float = 2.0,
             pp_axis: str | None = None) -> ParallelPlan:
    global _PLAN
    _PLAN = ParallelPlan(mesh=mesh, ep_axis=ep_axis,
                         capacity_factor=capacity_factor, pp_axis=pp_axis)
    return _PLAN


@contextmanager
def plan_scope(**kw):
    """Temporarily override the plan (tests, dryruns)."""
    global _PLAN
    prev = _PLAN
    _PLAN = replace(prev, **kw)
    try:
        yield _PLAN
    finally:
        _PLAN = prev
