"""Mesh construction: ("data", "fsdp", "tensor") axes over TPU chips.

The reference scales with torchrun+DDP/DeepSpeed-ZeRO/FSDP over NCCL
(reference: scripts/launch_sd3_train.sh:10, configs/deepspeed/*,
configs/fsdp/fsdp_sd3.json). The TPU-native equivalent is one
`jax.sharding.Mesh` whose axes express all three strategies at once:

- "data"   — pure data parallelism (DDP analogue),
- "fsdp"   — parameter/optimizer sharding with batch also split along it
             (ZeRO-3 / FSDP analogue; XLA all-gathers params per-op, which
             subsumes the reference's `summon_full_params` dance),
- "tensor" — Megatron-style tensor parallelism over attention heads / MLP
             width (absent in the reference; cheap to express in GSPMD).

Collectives ride the ICI when the mesh is laid out over a slice; on
multi-slice deployments put "data" on DCN (slowest-varying axis).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "tensor")


def auto_mesh_shape(n_devices: int) -> tuple[int, int, int]:
    """Pick a (data, fsdp, tensor) factorization for n devices.

    Heuristic for the TPDM workload: the trainable policy is tiny and the
    backbone is frozen, so favor fsdp (weight sharding for HBM headroom)
    over tensor, and give the remainder to data.
    """
    if n_devices <= 0:
        raise ValueError("n_devices must be positive")
    tensor = 2 if n_devices % 2 == 0 and n_devices >= 8 else 1
    rem = n_devices // tensor
    fsdp = 2 if rem % 2 == 0 else 1
    data = rem // fsdp
    assert data * fsdp * tensor == n_devices
    return data, fsdp, tensor


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    data: Optional[int] = None,
    fsdp: int = 1,
    tensor: int = 1,
) -> Mesh:
    """Create the ("data", "fsdp", "tensor") mesh.

    With no explicit shape, all visible devices go to an auto-factorized
    mesh. jax.experimental.mesh_utils is used when available so the mesh
    layout follows the physical ICI topology.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data, fsdp, tensor = auto_mesh_shape(n)
    if data * fsdp * tensor != n:
        raise ValueError(
            f"mesh shape {(data, fsdp, tensor)} != device count {n}"
        )
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(
            (data, fsdp, tensor), devices=np.asarray(devices)
        )
    except Exception:
        dev_array = np.asarray(devices).reshape(data, fsdp, tensor)
    return Mesh(dev_array, AXES)
