"""Shape bucketing helpers.

Everything under jit is compiled per static shape; data-dependent sizes
(growing caches, variable query batches) would trigger a recompile per call.
These helpers round sizes up to power-of-two buckets so the number of
distinct compiled shapes stays O(log N) over a whole run.
"""
import numpy as np


def next_bucket(n: int, minimum: int = 64) -> int:
    """Smallest power-of-two >= max(n, minimum)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def pad_rows(arr: np.ndarray, bucket: int, fill=0) -> np.ndarray:
    """Pad the leading axis of `arr` up to `bucket` rows with `fill`."""
    n = arr.shape[0]
    if n == bucket:
        return arr
    pad = np.full((bucket - n,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)
