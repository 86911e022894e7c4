"""Device-mesh construction for multi-chip / multi-host runs.

The reference is single-process Julia with no parallelism (SURVEY.md §2.4);
everything here is new capability. Axes:

 - 'dp' : data parallelism over the batch of gates — the primary throughput
          lever (independent ciphertext bits shard perfectly).
 - 'tp' : tensor parallelism over the bootstrap-key index axis in
          `pack_encrypted_bits` (psum-reduced), and the transform axis of the
          distributed four-step NTT (sequence-parallel analog for giant m).

Pipeline ('pp') and expert ('ep') parallelism have no analog in this workload
(the blind rotation's sequential chain could be staged across chips, but the
accumulator is tiny — ICI latency dominates; documented trade-off).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp <= n, f"mesh {dp}x{tp} needs {dp*tp} devices, have {n}"
    dev_array = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a gate batch over dp (leading axis), replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
