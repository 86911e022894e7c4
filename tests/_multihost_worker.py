"""Worker process for tests/test_multihost.py: joins a 2-process Gloo
cluster on the CPU backend (2 virtual devices per process = 4 global), builds
the host-major global mesh, and checks a cross-host modular reduction (the
pack-reduction pattern) against a locally computed value.

Run: python tests/_multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

from functools import partial  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
from jax import shard_map  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgfhe_tpu.parallel import distributed  # noqa: E402

distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs,
    process_id=proc_id,
)
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == nprocs * 2, jax.devices()

mesh = distributed.make_global_mesh(tp=2)  # dp=2 across hosts, tp=2 within
assert mesh.devices.shape == (2, 2)
# tp groups must never cross processes (the ICI-only axis)
for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1, "tp crosses a host!"

# Cross-host modular tree-reduction of uint32 residues, the communication
# pattern of pack_encrypted_bits_sharded (all_gather over dp + modular sum;
# a raw psum would overflow uint32). Data: a (8, 16) global array sharded
# over dp, each process holding its 4-row shard.
p = jnp.uint32((1 << 27) + 1)
global_shape = (8, 16)
rng = np.random.default_rng(7)
full = rng.integers(0, (1 << 27) + 1, global_shape).astype(np.uint32)
sharding = NamedSharding(mesh, P("dp"))
local_shards = [
    jax.device_put(full[sharding.addressable_devices_indices_map(global_shape)[d]], d)
    for d in sharding.addressable_devices
]
gl = jax.make_array_from_single_device_arrays(global_shape, sharding, local_shards)


@partial(shard_map, mesh=mesh, in_specs=P("dp"), out_specs=P(), check_vma=False)
def mod_reduce(x):
    parts = jax.lax.all_gather(x, axis_name="dp")  # (dp, rows, 16)
    acc = parts[0]
    for i in range(1, parts.shape[0]):
        s = acc + parts[i]
        acc = jnp.where(s >= p, s - p, s)
    return acc


out = mod_reduce(gl)
rows_half = global_shape[0] // 2
expected = (
    full[:rows_half].astype(np.uint64) + full[rows_half:].astype(np.uint64)
) % int(p)
got = np.asarray(jax.device_get(out))
np.testing.assert_array_equal(got, expected.astype(np.uint32))

print(f"proc {proc_id}: multihost mesh + cross-host modular reduction ok")
