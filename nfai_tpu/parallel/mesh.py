"""Device mesh construction.

The reference has no distributed support at all (SURVEY.md §2.7); this is the
TPU-native scaling layer: a named `jax.sharding.Mesh` over ICI (and DCN via
`jax.distributed.initialize` for multi-host), with GSPMD inserting collectives
from sharding annotations — no hand-written transport (cf. the reference's
single blocking compute queue, VulkanBufferManager.cs:474-494).

Axes:
  dp — data/request parallelism (batch dim of independent sequences)
  tp — tensor parallelism (attention heads / ffn columns / vocab)
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(
    mesh_shape: dict[str, int] | None = None,
    devices: list | None = None,
) -> Mesh:
    """Build a (dp, tp) mesh. Default: all devices on the tp axis.

    `mesh_shape` maps axis name → size, e.g. ``{"dp": 2, "tp": 4}``. A size of
    -1 means "whatever is left" (at most one axis may be -1).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = dict(mesh_shape or {})
    shape.setdefault(DP_AXIS, 1)
    shape.setdefault(TP_AXIS, -1)
    negatives = [k for k, v in shape.items() if v == -1]
    if len(negatives) > 1:
        raise ValueError("at most one mesh axis may be -1")
    if negatives:
        known = int(np.prod([v for v in shape.values() if v != -1]))
        if n % known != 0:
            raise ValueError(f"{n} devices not divisible by fixed axes {shape}")
        shape[negatives[0]] = n // known
    total = int(np.prod(list(shape.values())))
    if total != n:
        raise ValueError(f"mesh shape {shape} needs {total} devices, have {n}")
    # axis order: dp, tp first (their relative ICI locality matters most),
    # then any extra axes (e.g. "sp" for sequence parallelism) in the
    # caller's order
    names = [DP_AXIS, TP_AXIS] + [
        k for k in shape if k not in (DP_AXIS, TP_AXIS)
    ]
    dev_array = np.asarray(devices).reshape([shape[k] for k in names])
    return Mesh(dev_array, tuple(names))


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
