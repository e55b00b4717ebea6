"""Worker process for the multi-host DCN sweep test.

Launched N times by tests/test_multihost_sweep.py with
  argv: <coordinator_address> <num_processes> <process_id> <out_csv>
Each process owns 4 virtual CPU devices (XLA_FLAGS set by the launcher);
together they form the [hosts, cells] hybrid mesh the multi-slice TPU
deployment would use, and run the same sharded robustness sweep.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax

# Force the CPU backend BEFORE any backend initialization: a site PJRT
# plugin force-registers a remote TPU and overrides JAX_PLATFORMS (see
# CLAUDE.md) — config.update after import is the only reliable override.
jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, num_processes, process_id, out_csv = sys.argv[1:5]
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes),
        process_id=int(process_id),
    )
    assert jax.process_count() == int(num_processes)
    assert len(jax.devices()) == 4 * int(num_processes)

    import flexs_tpu as flexs
    from flexs_tpu.parallel import multihost
    from flexs_tpu.parallel.sweep import run_landscape_robustness_sweep

    mesh = multihost.multihost_sweep_mesh()
    assert mesh.devices.shape == (int(num_processes), 4)

    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    landscape = flexs.landscapes.TFBinding(**problem["params"])
    df = run_landscape_robustness_sweep(
        [landscape],
        flexs.DNAA,
        starts=flexs.landscapes.tf_binding.STARTS[:2],
        signal_strengths=[0.5, 1.0],
        seeds=[0, 1],
        rounds=2,
        sequences_batch_size=4,
        model_queries_per_batch=20,
        mesh=mesh,
    )
    assert len(df) == 8  # 2 starts x 2 signal strengths x 2 seeds
    df.to_csv(out_csv, index=False)
    print(f"process {process_id} ok: {len(df)} cells", flush=True)


if __name__ == "__main__":
    main()
