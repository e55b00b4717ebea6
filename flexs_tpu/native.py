"""ctypes bindings for the native host-side scorers (native/flexs_native.cc).

The shared library is built by scripts/build_native.sh (g++, no external
deps); if it is missing, `load()` attempts an on-the-fly build and
otherwise raises — callers treat native scoring as an optional fast host
path (the JAX device path is always available and is the source of truth;
tests/test_native.py pins bit-level agreement).
"""
import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB = os.path.join(_ROOT, "native", "libflexs_native.so")


@lru_cache(maxsize=1)
def load() -> ctypes.CDLL:
    """Load (building if necessary) the native library."""
    if not os.path.exists(_LIB):
        subprocess.run(
            ["sh", os.path.join(_ROOT, "scripts", "build_native.sh")],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_LIB)

    lib.rosetta_score_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.rna_duplex_energy_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),  # stack
        ctypes.POINTER(ctypes.c_float),  # mA
        ctypes.POINTER(ctypes.c_float),  # mB
        ctypes.POINTER(ctypes.c_float),  # int11
        ctypes.POINTER(ctypes.c_float),  # ext5
        ctypes.POINTER(ctypes.c_float),  # ext3
        ctypes.POINTER(ctypes.c_float),  # interior_cost
        ctypes.POINTER(ctypes.c_float),  # bulge_sizes
        ctypes.c_int32,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def rosetta_score_batch(landscape, tokens: np.ndarray) -> np.ndarray:
    """Score int[B, L] AA tokens with the native centroid scorer.

    `landscape` is a flexs_tpu.landscapes.rosetta.RosettaFolding; the same
    folded tables used by its device path are passed to C++.
    """
    env_site, pair_site, pair_i, pair_j, consts = (
        np.ascontiguousarray(np.asarray(x)) for x in landscape._fitness_params
    )
    tokens = np.ascontiguousarray(tokens, np.int32)
    batch, length = tokens.shape
    out = np.empty(batch, np.float32)
    load().rosetta_score_batch(
        _f32p(env_site.astype(np.float32)),
        _f32p(pair_site.astype(np.float32)),
        _i32p(pair_i.astype(np.int32)),
        _i32p(pair_j.astype(np.int32)),
        np.int32(len(pair_i)),
        np.int32(length),
        _i32p(tokens),
        np.int32(batch),
        np.float32(consts[0]),
        np.float32(consts[1]),
        _f32p(out),
    )
    return out


def rna_duplex_energy_batch(seq_tokens, target_tokens, params=None) -> np.ndarray:
    """Native duplex energies of int[B, L1] tokens vs one target."""
    from flexs_tpu.ops import rna_duplex as rd

    params = params or rd.DuplexParams.calibrated()
    seq_tokens = np.ascontiguousarray(seq_tokens, np.int32)
    target_rev = np.ascontiguousarray(
        np.asarray(target_tokens, np.int32)[::-1]
    )
    c = lambda a: np.ascontiguousarray(a, np.float32)
    batch, l1 = seq_tokens.shape
    out = np.empty(batch, np.float32)
    load().rna_duplex_energy_batch(
        _i32p(seq_tokens),
        np.int32(batch),
        np.int32(l1),
        _i32p(target_rev),
        np.int32(len(target_rev)),
        _f32p(c(params.stack)),
        _f32p(c(params.mA)),
        _f32p(c(params.mB)),
        _f32p(c(params.int11)),
        _f32p(c(params.ext5)),
        _f32p(c(params.ext3)),
        _f32p(c(params.interior_cost_matrix())),
        _f32p(c(params.bulge_sizes)),
        np.int32(params.maxloop),
        np.float32(params.duplex_init),
        np.float32(params.terminal_au),
        _f32p(out),
    )
    return out
