"""Worker process for the two-process jax.distributed test
(tests/test_multihost_e2e.py).  Joins the distributed runtime via
parallel.multihost, builds a global mesh spanning both processes, and runs
a real cross-process collective (sharded global sum)."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from pytorch_kaldi_asr_tpu.parallel import multihost  # noqa: E402


def main():
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    idx, cnt = multihost.initialize(
        coordinator=f"127.0.0.1:{port}", num_processes=n, process_id=pid)
    assert (idx, cnt) == (pid, n), (idx, cnt)
    assert jax.device_count() == n * jax.local_device_count()

    mesh = Mesh(jax.devices(), ("data",))
    local = jnp.ones((jax.local_device_count(), 4)) * (pid + 1)
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local,
        (jax.device_count(), 4))
    total = jax.jit(lambda a: a.sum(),
                    out_shardings=NamedSharding(mesh, P()))(x)
    expected = 4 * sum(range(1, n + 1)) * jax.local_device_count()
    assert float(total) == expected, (float(total), expected)

    # per-process work sharding drops ragged items uniformly
    items = list(range(7))
    mine = multihost.shard_for_process(items, idx, cnt)
    assert len(mine) == 7 // n
    print(f"MULTIHOST_OK {idx}/{cnt} total={float(total)}", flush=True)


if __name__ == "__main__":
    main()
