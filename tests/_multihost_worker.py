"""Two-process worker for tests/test_multihost.py.

Launched twice (process_id 0 and 1) with a shared localhost coordinator.
Each process owns 4 virtual CPU devices (8 global), joins via
``multihost.init``, then exercises the two distributed branches the
single-process tests cannot reach:

* ``global_frame_batch`` at ``process_count()==2`` — the media-plane
  `/raw` analog (HTTPServer.cpp fan-out): each host's local frames enter
  a global jax.Array whose addressable shards hold exactly this host's
  data (no DCN for the stateless chain).
* ``broadcast_meta`` — the `/meta` analog (RemoteMetaSync.cpp): process
  1 passes None and must receive process 0's snapshot.

Prints one JSON line of assertions for the parent test to check.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import numpy as np  # noqa: E402


def main() -> int:
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    import jax

    jax.config.update("jax_platforms", "cpu")

    from retrocapture_tpu.parallel import multihost
    from retrocapture_tpu.parallel.mesh import DATA_AXIS, make_mesh

    assert multihost.init(coordinator, 2, pid) is True
    assert jax.process_count() == 2
    assert multihost.is_distributed() is True
    n_global = len(jax.devices())

    # -- media plane: host-local shards of a global batch ---------------
    rng = np.random.default_rng(100 + pid)
    local = (rng.random((4, 8, 12, 3)) * 255).astype(np.uint8)
    mesh = make_mesh()  # all 8 global devices on the data axis
    batch = multihost.global_frame_batch(local, mesh)
    global_b = batch.shape[0]
    spec0 = str(batch.sharding.spec[0])
    # Every addressable shard must hold a slice of THIS host's frames —
    # the shards stay where they were captured.
    local_rows = []
    shards_local = True
    for sh in batch.addressable_shards:
        data = np.asarray(sh.data)
        start = sh.index[0].start or 0
        expect = local[start - pid * 4 : start - pid * 4 + data.shape[0]]
        if not np.array_equal(data, expect):
            shards_local = False
        local_rows.append(data.shape[0])

    # A jitted global reduction over the mesh proves the two processes
    # participate in one SPMD program (fully-replicated scalar result is
    # addressable on both hosts).
    import jax.numpy as jnp

    total = float(jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))(batch))

    # -- control plane: coordinator snapshot reaches the non-source -----
    meta_in = (
        {"preset": "crt/crt-mattias.glslp", "parameters": {"CURVATURE": 0.3}}
        if pid == 0
        else None
    )
    meta_out = multihost.broadcast_meta(meta_in, source=0)

    print(
        json.dumps(
            {
                "pid": pid,
                "n_global_devices": n_global,
                "global_batch": global_b,
                "spec0": spec0,
                "shards_local": shards_local,
                "local_rows_sum": int(sum(local_rows)),
                "total": total,
                "local_sum": float(local.astype(np.float64).sum()),
                "meta": meta_out,
                "data_axis": DATA_AXIS,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
