"""Worker for the 2-process multi-host loopback test (run by
tests/test_multiprocess.py, one subprocess per simulated host).

Verifies, with jax.process_count() == 2 for real:
  * shard_batch's ``jax.make_array_from_process_local_data`` branch
    assembles per-host batch slices into the correct GLOBAL arrays
    (parallel/mesh.py:93-97) — checked by a jitted global-mean reduction
    against the full-batch numpy value;
  * all_reduce_sum_tree sums host-local eval meters/confusion matrices
    across processes (parallel/mesh.py:103-117) — the TPU-native analog of
    the reference's reduce_scalar_outputs (utils/experiment.py:231-258).

Usage: _multiproc_worker.py <process_id> <coordinator_port>
Requires env: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    pid, port = int(sys.argv[1]), int(sys.argv[2])
    # The axon sitecustomize overrides the JAX_PLATFORMS env var at import
    # time (register() sets jax_platforms="axon,cpu"); the config update
    # after import wins, like tests/conftest.py.
    jax.config.update("jax_platforms", "cpu")
    # Without a cross-process collectives impl the CPU client comes up
    # single-process even under jax.distributed (process_count() == 1).
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np

    from semstereo_tpu.parallel import all_reduce_sum_tree, make_mesh, shard_batch

    # Global batch both hosts agree on (seeded); each host holds its slice,
    # exactly as the loader's process_index sharding produces.
    rng = np.random.default_rng(0)
    gb = {
        "left": rng.standard_normal((8, 8, 16, 3)).astype(np.float32),
        "disparity": rng.standard_normal((8, 8, 16)).astype(np.float32),
    }
    local = {k: v[pid * 4 : (pid + 1) * 4] for k, v in gb.items()}

    mesh = make_mesh()  # data=8 over the 2x4 global CPU devices
    gbatch = shard_batch(mesh, local)
    for k, v in gbatch.items():
        assert v.shape == gb[k].shape, (k, v.shape, gb[k].shape)

    # jitted global reduction over the assembled arrays: wrong per-host
    # placement or ordering would change the means.
    means = jax.jit(lambda b: {k: jax.numpy.mean(v) for k, v in b.items()})(gbatch)
    for k in gb:
        got = float(means[k])
        want = float(gb[k].mean())
        assert abs(got - want) < 1e-5, (k, got, want)

    # per-row check pins the ORDER of assembly (mean alone is permutation-
    # invariant): row i of the global array must be row i of the global batch.
    row = jax.jit(lambda b: jax.numpy.sum(b["left"], axis=(1, 2, 3)))(gbatch)
    want_rows = gb["left"].sum(axis=(1, 2, 3))
    shards = row.addressable_shards
    assert len(shards) == 4, len(shards)
    for sh in shards:  # each shard's .index selects its global rows
        np.testing.assert_allclose(
            np.asarray(sh.data), want_rows[sh.index], rtol=1e-5
        )

    # eval-meter aggregation: each host contributes a distinct matrix
    cm = np.full((3, 3), float(pid + 1), np.float64)
    out = all_reduce_sum_tree({"confusion": cm, "count": np.float64(pid + 1)})
    np.testing.assert_allclose(out["confusion"], np.full((3, 3), 3.0))
    assert float(out["count"]) == 3.0

    # reduce_eval_meters with DIVERGENT per-host meter keys — the advisor-r4
    # hang case: sparse NaN-skipping dicts whose key sets differ across hosts
    # (a seg class absent from one host's whole shard, different batch
    # counts).  The dense fixed-order reduce must neither hang nor mis-pair.
    from semstereo_tpu.metrics import SegmentationMeter
    from semstereo_tpu.train.trainer import reduce_eval_meters
    from semstereo_tpu.utils import AverageMeterDict, AverageMeterDictPerKey

    meters = AverageMeterDict()
    seg_meter = SegmentationMeter(2)
    seg_batch = AverageMeterDictPerKey()
    if pid == 0:
        meters.update({"EPE": 1.0, "D1": 0.5})
        meters.update({"EPE": 2.0, "D1": 0.7})
        seg_batch.update({"PA": 0.5, "IoU0": 0.25, "IoU1": float("nan")})
        seg_meter.add_confusion(np.eye(2))
    else:  # fewer batches AND a key (IoU1) host 0 never produced finite
        meters.update({"EPE": 3.0, "D1": 0.9})
        seg_batch.update({"PA": 0.7, "IoU1": 0.5})
    reduce_eval_meters(meters, seg_meter, seg_batch, 2)
    assert meters.count == 3, meters.count
    np.testing.assert_allclose(meters.mean()["EPE"], 2.0)
    np.testing.assert_allclose(meters.mean()["D1"], 0.7)
    assert "label_loss" not in meters.mean()  # no host produced it
    np.testing.assert_allclose(seg_batch.mean()["PA"], 0.6)
    np.testing.assert_allclose(seg_batch.mean()["IoU0"], 0.25)
    np.testing.assert_allclose(seg_batch.mean()["IoU1"], 0.5)
    np.testing.assert_allclose(seg_meter.cm, np.eye(2))

    print(f"WORKER{pid} OK", flush=True)


if __name__ == "__main__":
    main()
