"""Multi-host runtime: process initialization, host-aware meshes, and the
scaling-efficiency harness.

The reference is single-process Julia (SURVEY.md §2.4 — no communication
backend at all); this is new capability mandated by the north star
(BASELINE.md: >= 80% scaling efficiency at >= 2 hosts).

Design: one JAX process per host, `jax.distributed.initialize` to form the
global runtime, then a GLOBAL mesh whose axes are laid out so that

 - 'tp' (tensor-parallel: the pack reduction / distributed-NTT axis) maps to
   chips WITHIN a host — its all_gather/all_to_all traffic rides ICI;
 - 'dp' (data-parallel gate batches) spans hosts — its only cross-host
   traffic is the embarrassingly-parallel batch split, so DCN sees nothing
   in the hot loop.

Verified without hardware by the multi-process CPU path: each host-process
gets virtual CPU devices and collectives run over Gloo
(tests/test_multihost.py spawns real processes), exactly how the TPU path
initializes — only the transport differs.
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
from jax.sharding import Mesh

from . import mesh as mesh_mod


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Join the multi-host runtime (wraps `jax.distributed.initialize`).

    On TPU pods the three Nones auto-discover from the TPU environment; on
    CPU/GPU pass them explicitly (or via JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID). Single-process callers may skip this
    entirely. CPU backends get Gloo collectives so the same code runs in the
    multi-process CPU harness.
    """
    # NOTE: must not touch the backend (jax.devices/default_backend) before
    # jax.distributed.initialize — decide from the environment only.
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jax without the option: single-host only
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def make_global_mesh(tp: int = 1) -> Mesh:
    """('dp', 'tp') mesh over ALL processes' devices, host-major.

    Devices are ordered by (process_index, local order) and reshaped
    (dp, tp) with tp innermost, so a tp group never crosses a host boundary
    (tp <= chips per host required): tp collectives ride ICI, dp spans DCN.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    per_host = {}
    for d in devs:
        per_host.setdefault(d.process_index, []).append(d)
    local_counts = {k: len(v) for k, v in per_host.items()}
    min_local = min(local_counts.values())
    assert tp <= min_local and min_local % tp == 0, (
        f"tp={tp} must divide the per-host device count {min_local} "
        f"(a tp group must not cross hosts)"
    )
    n = len(devs)
    dp = n // tp
    dev_array = np.array(devs).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


def process_count() -> int:
    return jax.process_count()


def scaling_report(params, ctx, bkey, lwe1, lwe2, device_counts=None,
                   iters: int = 3, out=None):
    """Measure bootstrap gates/s on sub-meshes of 1, 2, 4, ... devices and
    report parallel efficiency vs the single-device rate.

    Only meaningful single-process (sub-meshes of a multi-process run would
    deadlock); multi-host efficiency comes from running the bench per
    configuration. Returns [(n_devices, gates_per_sec, efficiency)].
    """
    from . import sharded

    devs = jax.devices()
    if device_counts is None:
        # default to the two endpoints: every mesh size costs a full XLA
        # compile (minutes on the CPU-simulated mesh); pass an explicit list
        # for a full sweep on real hardware
        device_counts = [1, len(devs)] if len(devs) > 1 else [1]
    rows = []
    base = None       # per-device rate of the FIRST row (any device count)
    base_nd = None
    batch = lwe1.a.shape[0]
    for nd in device_counts:
        mesh = mesh_mod.make_mesh(dp=nd, tp=1, devices=devs[:nd])
        res = sharded.bootstrap_batch_sharded(params, ctx, bkey, lwe1, lwe2, mesh)
        jax.block_until_ready(res[0].a)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            res = sharded.bootstrap_batch_sharded(
                params, ctx, bkey, lwe1, lwe2, mesh
            )
        jax.block_until_ready(res[0].a)
        gps = batch * iters / (time.perf_counter() - t0)
        if base is None:
            base, base_nd = gps, nd
        # efficiency = per-device rate vs the first row's per-device rate,
        # correct for ANY device_counts list (e.g. [2, 4, 8]), not just
        # lists starting at 1
        eff = (gps / nd) / (base / base_nd)
        rows.append((nd, gps, eff))
        if out is not None:
            print(
                f"devices={nd}: {gps:.1f} gates/s, efficiency {eff*100:.0f}%",
                file=out,
            )
    return rows
