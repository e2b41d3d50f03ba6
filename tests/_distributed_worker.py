"""Worker for the 2-process jax.distributed CPU-cluster test.

Run as: python tests/_distributed_worker.py <process_id> <num_processes>
        <port> <workdir> [total_devices=4]

total_devices spans the global mesh (data=total//2, event=2); the 2-process
test uses the default 4, the N-hosts correctness harness
(benchmarks/scaling_hosts.py) passes 8.

With num_processes=2 this exercises the real multi-host path of
train_flow (host-local loading -> host_local_batch_to_global -> SPMD train
step; per-host validation -> MetricBank.reduce_across_processes); with
num_processes=1 the same data/config runs single-process to produce the
reference scalars.  Both use a 4-device (data=2, event=2) mesh so the global
partitioning is identical and losses match to float tolerance.
"""

import json
import os
import sys


def main():
    pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    total_devices = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    per_proc_devices = total_devices // nproc
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={per_proc_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from motionpriorcmax_tpu.parallel import (host_local_batch_to_global,
                                              initialize_distributed,
                                              make_mesh)

    if nproc > 1:
        initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == total_devices

    import numpy as np

    out = {}

    # --- Part A: host-local -> global batch assembly ----------------------
    if nproc > 1 and total_devices == 4:
        mesh = make_mesh(data=2, event=2)
        local = {"events": np.full((1, 8, 6), float(pid + 1), np.float32),
                 "voxel": np.full((1, 3, 4, 4), float(pid + 1), np.float32)}
        gbatch = host_local_batch_to_global(mesh, local)
        assert gbatch["events"].shape == (2, 8, 6), gbatch["events"].shape
        total = float(jax.jit(lambda b: sum(x.sum() for x in b.values()))(gbatch))
        # proc0 contributes 1s (48 + 48 elements), proc1 contributes 2s.
        out["global_sum"] = total

        # --- Part B: cross-process metric reduction -----------------------
        from motionpriorcmax_tpu.metrics import MetricBank

        bank = MetricBank()
        bank.update({"epe": float(pid + 1)}, {"epe": 1.0})
        reduced = bank.reduce_across_processes()
        out["reduced_epe"] = reduced.compute()["epe"]  # (1+2)/2 = 1.5

    # --- Part C: train_flow over the multi-host path ----------------------
    from motionpriorcmax_tpu.data.loader import DataLoader
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.training import TrajectoryNetConfig
    from motionpriorcmax_tpu.training.loop import train_flow

    h, w, nbins, n_ev = 16, 16, 3, 256

    class SyntheticDataset:
        """4 deterministic samples; identical on every process."""

        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.default_rng(100 + i)
            y = rng.uniform(0, h - 1, n_ev)
            x = rng.uniform(0, w - 1, n_ev)
            t = rng.uniform(0, 1, n_ev)
            p = rng.integers(0, 2, n_ev).astype(np.float32)
            b = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
            events = np.stack([y, x, t, p, b], -1).astype(np.float32)
            gt = rng.normal(size=(2, h, w)).astype(np.float32)
            valid = (rng.uniform(size=(h, w)) < 0.8)
            return {"events": events, "forward_flow": gt,
                    "flow_valid": valid.astype(np.float32)}

    data_axis = total_devices // 2
    mesh = make_mesh(data=data_axis, event=2)
    shard = (pid, nproc) if nproc > 1 else None
    ds = SyntheticDataset()
    train_loader = DataLoader(ds, batch_size=data_axis // nproc,
                              capacity=n_ev,
                              shuffle=False, num_workers=1, shard=shard)
    val_loader = DataLoader(ds, batch_size=data_axis // nproc,
                            capacity=n_ev,
                            shuffle=False, num_workers=1, shard=shard)

    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins,
                              num_basis=1, patch_size=4,
                              basis_type="polynomial")
    loss_cfg = FocusLossConfig(image_shape=(h, w), num_bins=nbins, num_knn=4,
                               polarity_aware_batching=False,
                               knn_block_size=64)
    res = train_flow(cfg, loss_cfg, train_loader, val_loader,
                     os.path.join(workdir, f"run_p{nproc}"),
                     max_epochs=1, log_every=1, mesh=mesh)
    out["best"] = res["best"]
    out["steps"] = res["steps"]

    with open(os.path.join(workdir, f"out_n{nproc}_p{pid}.json"), "w") as fh:
        json.dump(out, fh)
    print(f"worker {pid}/{nproc} OK: {out}", flush=True)


if __name__ == "__main__":
    main()
