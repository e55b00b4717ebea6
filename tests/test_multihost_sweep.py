"""Multi-host (DCN) sweep sharding test — SURVEY.md §2.5 checklist.

Two `jax.distributed`-coordinated CPU processes with 4 virtual devices each
form the [hosts=2, cells=4] hybrid mesh of flexs_tpu.parallel.multihost;
the sharded robustness sweep must partition its 8-cell grid across the
processes (cells over the DCN axis, zero cross-slice collectives) and
gather identical full results on every host — which must also equal the
plain single-process run of the same grid.
"""
import os
import socket
import subprocess
import sys

import pandas as pd

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_ROOT, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dcn_sweep(tmp_path):
    port = _free_port()
    n_proc = 2
    outs = [str(tmp_path / f"proc{i}.csv") for i in range(n_proc)]

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, f"localhost:{port}", str(n_proc), str(i),
             outs[i]],
            env=env,
            cwd=_ROOT,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(n_proc)
    ]
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    frames = [pd.read_csv(o) for o in outs]
    # Every host gathered the SAME full 8-cell result.
    pd.testing.assert_frame_equal(frames[0], frames[1])

    # And it matches the single-process run of the identical grid (the
    # sweep is deterministic per (cell, seed) regardless of sharding).
    import flexs_tpu as flexs
    from flexs_tpu.parallel.sweep import run_landscape_robustness_sweep

    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    landscape = flexs.landscapes.TFBinding(**problem["params"])
    ref = run_landscape_robustness_sweep(
        [landscape],
        flexs.DNAA,
        starts=flexs.landscapes.tf_binding.STARTS[:2],
        signal_strengths=[0.5, 1.0],
        seeds=[0, 1],
        rounds=2,
        sequences_batch_size=4,
        model_queries_per_batch=20,
    )
    got = frames[0]
    assert list(got["max_fitness"].round(5)) == list(ref["max_fitness"].round(5))
    assert list(got["model_cost"]) == list(ref["model_cost"])
