"""Multi-chip serving: shard the decode->preprocess pipeline over a mesh.

Demonstrates the scaling design (SURVEY.md §2.4 beyond-reference row):
staged batches are sharded over a `jax.sharding.Mesh` "data" axis and
the fused (Pallas or XLA) preprocess runs on every chip via shard_map —
embarrassingly parallel, no collectives on the hot path.

Runs anywhere: with fewer real devices than requested it re-execs onto a
virtual CPU mesh (`--xla_force_host_platform_device_count`), exactly how
the multichip dryrun self-bootstraps.

Usage: python3 samples/sample_multichip.py <video> [n_devices] [batches]
"""

import os
import subprocess
import sys

sys.path.insert(0, ".")


def main():
    uri = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/tests/data/test.mp4"
    n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax

    if len(jax.devices()) < n_dev:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count={n_dev}")
        print(f"re-exec onto a virtual {n_dev}-device CPU mesh")
        raise SystemExit(subprocess.call(
            [sys.executable, os.path.abspath(__file__), uri, str(n_dev),
             str(n_batches)], env=env))

    import numpy as np  # noqa: E402

    from vali_tpu.parallel.mesh import make_mesh  # noqa: E402
    from vali_tpu.pipeline.multistream import MultiStreamPipeline  # noqa

    mesh = make_mesh(data=n_dev)
    print(f"mesh: {mesh.shape} over {[str(d) for d in mesh.devices.flat]}")

    pipe = MultiStreamPipeline([uri] * n_dev, dst_w=224, dst_h=224,
                               batch_size=n_dev * 2, mesh=mesh)
    done = 0
    for batch, ids in pipe:
        shards = batch.addressable_shards
        per_dev = {str(s.device): s.data.shape[0] for s in shards}
        print(f"batch {done}: {batch.shape} sharded as "
              f"{sorted(per_dev.values())} frames/device "
              f"across {len(per_dev)} devices; "
              f"mean={float(np.asarray(batch).mean()):.1f}")
        done += 1
        if done >= n_batches:
            pipe.stop()
            break
    assert done == n_batches
    print(f"OK: {done} sharded batches across {n_dev} devices")


if __name__ == "__main__":
    main()
