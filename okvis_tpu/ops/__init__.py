"""TPU kernels (MXU Hamming matching; Pallas variants)."""

from .hamming import (  # noqa: F401
    hamming_matrix,
    hamming_matrix_mxu,
    hamming_matrix_xla,
    masked_distance_matrix,
    match_descriptors,
    mutual_best_assignment,
)
