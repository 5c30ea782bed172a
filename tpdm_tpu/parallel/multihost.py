"""Multi-host helpers: the TPU equivalents of the reference's host-side
collectives.

The reference scatters eval prompts with accelerate's
`split_between_processes` and gathers PIL images with `gather_object` over
NCCL (reference: src/train/callbacks.py:53,81-86). On TPU pods the
idiomatic moves are: shard host work by `jax.process_index()`, ship arrays
(uint8 images, not Python objects), and gather with
`multihost_utils.process_allgather` over ICI/DCN.
"""

from __future__ import annotations

from typing import Sequence, TypeVar

import jax
import numpy as np

T = TypeVar("T")


def split_between_processes(
    items: Sequence[T], index: int | None = None, count: int | None = None
) -> list[T]:
    """This host's contiguous slice of a work list (padded hosts get fewer).

    index/count default to jax.process_index()/process_count(); explicit
    values allow testing the split logic without a multi-process runtime.
    """
    n = jax.process_count() if count is None else count
    i = jax.process_index() if index is None else index
    per = -(-len(items) // n)
    return list(items[i * per : (i + 1) * per])


def allgather_arrays(local: np.ndarray) -> np.ndarray:
    """Gather a per-host array to every host along a new leading axis.

    Single-process: returns local[None]. Multi-process: uses
    jax.experimental.multihost_utils.process_allgather.
    """
    if jax.process_count() == 1:
        return np.asarray(local)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(local))


def broadcast_from_host0(value: np.ndarray) -> np.ndarray:
    """Agree on host-0's value everywhere (the reference broadcasts its
    run-name timestamp, rloo_trainer.py:130-131)."""
    if jax.process_count() == 1:
        return np.asarray(value)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.broadcast_one_to_all(np.asarray(value))
    )
