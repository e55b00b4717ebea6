"""Device compute kernels (distance, folding DPs, etc.)."""
from flexs_tpu.ops.hamming import (  # noqa: F401
    edit_distance_matrix,
    hamming_distance_matrix,
)
