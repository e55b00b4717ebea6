"""Mesh-parallel sweep engines (the FLEXS-native scale axis).

The reference scaled out by launching independent cloud VMs per sweep cell
(reference paper_code/cloud/runner.py); here the sweep grid is a device
axis: every (landscape, start, signal-strength, seed) cell runs as one lane
of a vmapped fused program, sharded across the TPU mesh (SURVEY.md §2.5).
"""
from flexs_tpu.parallel.sweep import (  # noqa: F401
    run_adaptivity_sweep,
    run_efficiency_sweep,
    run_landscape_robustness_sweep,
    run_robustness_sweep,
    sweep_adalead_nam,
)
