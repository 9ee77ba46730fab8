"""gkl_tpu — TPU-native genomics kernel engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of Intel's
GKL (Genomics Kernel Library): PairHMM forward likelihoods, affine-gap
Smith-Waterman with CIGAR backtrack, PDHMM scoring, and DEFLATE block
compression for BAM I/O — lane-batched across pairs on the VPU, sharded
data-parallel across TPU meshes, with a host-side native codec stage.
"""

import jax

# The correctness contract (double-precision modes and rescue paths; see
# BASELINE.md) requires float64 support end-to-end.
jax.config.update("jax_enable_x64", True)

from .api import (  # noqa: E402
    HaplotypeData,
    PairHMM,
    PairHMMNativeArguments,
    ReadData,
)
from .api_pdhmm import (  # noqa: E402
    PDHaplotypeData,
    PDHMM,
    PDHMMNativeArguments,
)
from .context import MIN_ACCEPTED  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "HaplotypeData",
    "PairHMM",
    "PairHMMNativeArguments",
    "PDHaplotypeData",
    "PDHMM",
    "PDHMMNativeArguments",
    "ReadData",
    "MIN_ACCEPTED",
    "__version__",
]
