"""A/B falsification profile of the surrogate-SWEEP per-cell regression.

Round-3 record (BASELINE.md): a single fused Rosetta-CNN-Adalead run costs
0.21 s steady, but 20 vmapped cells cost 7.5 s = 0.37 s/cell — vmapping
LOSES 76% per-cell efficiency, when its only job on one chip is compile
amortization.  VERDICT r3 weak #1 asks for the duplex-kernel treatment:
measure each structural hypothesis instead of guessing.

Hypotheses measured here (each row is a median-of-3 steady-state time):

  h0  single-run steady state (the 0.21 s baseline)
  h1  20 serial dispatches of the single-run program (the "don't sweep"
      floor: ~20x h0 minus nothing — every dispatch pays the relay)
  h2  the 20-cell sweep as shipped (the 7.5 s regression)
  h3  arch=mlp single vs swept — if the mlp sweep scales ~linearly while
      the cnn sweep does not, the vmapped-conv lowering is the cost
      (per-cell kernels make the conv a batched-filter conv, which XLA
      cannot express as one MXU conv; matmuls batch natively)
  h4  epochs=1 sweep — if time barely drops, training is NOT the cost
      center and the 2000-query/round predict path is
  h5  ensemble_size=3 single run — a vmap over members inside ONE run is
      the same batched-filter conv shape; if members cost ~nothing extra
      per member, the vmap axis itself is innocent
  h6  20 IDENTICAL cells (same start, same seed -> identical while-loop
      trip counts) under vmap — if this hits ~single-run cost, the
      regression is vmap LOCKSTEPPING the data-dependent generation
      loops: every cell pays the max trip count over the whole shard
  h7  the shipped mixed grid with sequential `lax.map` cells
      (cell_mode="map") — each cell runs its own trip counts; this is
      the shipped fix (cell_mode="auto")

Round-4 measured outcome (BASELINE.md table): h0 0.219 s, h1 0.205 s/cell,
h2 0.381 s/cell, h3 mlp 2.29x (conv hypothesis dead), h4 0.451 s/cell
(training-cost hypothesis dead), h5 0.273 s (member-vmap cheap), h6
0.193 s/cell (lockstep CONFIRMED), h7 0.207 s/cell (fix at single-run
parity).

Run on the real TPU (one process at a time):
    python scripts/profile_surrogate_sweep.py h0 h2 ...
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import flexs_tpu as flexs
from flexs_tpu.landscapes import rosetta
from flexs_tpu.parallel import run_landscape_robustness_sweep
from flexs_tpu.runtime.jit_runner import DeviceAdaleadNAM
from flexs_tpu.runtime.surrogate import SurrogateSpec

PROBLEM = rosetta.registry()["3msi"]
STARTS = list(PROBLEM["starts"].values())


def _landscape():
    return rosetta.RosettaFolding(**PROBLEM["params"])


def _median3(fn):
    fn()  # warm (compile+first dispatch)
    walls = []
    for _ in range(3):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return float(np.median(walls)), walls


def _single(spec, start=0):
    land = _landscape()
    explorer = DeviceAdaleadNAM(
        land,
        flexs.AAS,
        rounds=10,
        sequences_batch_size=100,
        model_queries_per_batch=2000,
        starting_sequence=STARTS[start],
        model="surrogate",
        surrogate_spec=spec,
    )
    return explorer


def _sweep(spec, cells=20, starts=None, seeds=None, cell_mode="vmap"):
    land = _landscape()
    if starts is None:
        starts = STARTS[: min(cells, len(STARTS))]
    if seeds is None:
        seeds = list(range(-(-cells // len(starts))))

    def run():
        return run_landscape_robustness_sweep(
            [land],
            flexs.AAS,
            starts=starts,
            signal_strengths=[1.0],
            seeds=seeds,
            rounds=10,
            sequences_batch_size=100,
            model_queries_per_batch=2000,
            model="surrogate",
            surrogate_spec=spec,
            cell_mode=cell_mode,
        )

    return run


def h0():
    ex = _single(SurrogateSpec())
    med, walls = _median3(lambda: ex.run(verbose=False))
    print(f"h0 single cnn run:        {med:.3f}s  {['%.2f' % w for w in walls]}")


def h1():
    ex = _single(SurrogateSpec())
    ex.run(verbose=False)
    t0 = time.time()
    for _ in range(20):
        ex.run(verbose=False)
    dt = time.time() - t0
    print(f"h1 20 serial cnn runs:    {dt:.2f}s = {dt/20:.3f}s/cell")


def h2():
    med, walls = _median3(_sweep(SurrogateSpec()))
    print(
        f"h2 20-cell cnn sweep:     {med:.2f}s = {med/20:.3f}s/cell  "
        f"{['%.2f' % w for w in walls]}"
    )


def h3():
    spec = SurrogateSpec(arch="mlp")
    ex = _single(spec)
    med_s, _ = _median3(lambda: ex.run(verbose=False))
    med_w, _ = _median3(_sweep(spec))
    print(
        f"h3 mlp single {med_s:.3f}s vs sweep {med_w:.2f}s = "
        f"{med_w/20:.3f}s/cell (ratio {med_w/(20*med_s):.2f}x; "
        f"cnn ratio from h0/h2 for comparison)"
    )


def h4():
    med, _ = _median3(_sweep(SurrogateSpec(epochs=1)))
    print(f"h4 20-cell sweep epochs=1: {med:.2f}s = {med/20:.3f}s/cell")


def h5():
    ex = _single(SurrogateSpec(ensemble_size=3))
    med, walls = _median3(lambda: ex.run(verbose=False))
    print(f"h5 single 3xCNN run:      {med:.3f}s  {['%.2f' % w for w in walls]}")


def h6():
    # 20 IDENTICAL cells: same start, same seed -> identical trip counts
    # -> lockstep costs nothing.  ~single-run cost here convicts lockstep.
    med, walls = _median3(
        _sweep(SurrogateSpec(), starts=[STARTS[0]], seeds=[0] * 20)
    )
    print(
        f"h6 20 IDENTICAL cells (vmap): {med:.2f}s = {med/20:.3f}s/cell  "
        f"{['%.2f' % w for w in walls]}"
    )


def h7():
    med, walls = _median3(_sweep(SurrogateSpec(), cell_mode="map"))
    print(
        f"h7 shipped grid, lax.map:     {med:.2f}s = {med/20:.3f}s/cell  "
        f"{['%.2f' % w for w in walls]}"
    )


STEPS = {
    "h0": h0, "h1": h1, "h2": h2, "h3": h3, "h4": h4, "h5": h5,
    "h6": h6, "h7": h7,
}

if __name__ == "__main__":
    import jax

    print(f"backend: {jax.default_backend()}")
    for name in sys.argv[1:] or list(STEPS):
        STEPS[name]()
