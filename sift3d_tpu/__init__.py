"""sift3d_tpu: TPU-native 3D SIFT volumetric feature + registration engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CPU implementation (SCUT-CCNL/3DSIFT): 3D Gaussian scale space, DoG keypoint
detection, icosahedral gradient-histogram descriptors, brute-force ratio-test
matching (inject/biject/enhanced), plus multi-chip sharding and groupwise
registration layers that the single-process reference does not have.
"""

__version__ = "0.1.0"

from .api import extract_file, load_volume, match_files, process_batch
from .config import SiftConfig
from .pipeline import (
    SIFT3D,
    KeypointSet,
    biject_match,
    enhanced_match,
    inject_match,
)

__all__ = [
    "SiftConfig",
    "extract_file",
    "load_volume",
    "match_files",
    "process_batch",
    "SIFT3D",
    "KeypointSet",
    "enhanced_match",
    "biject_match",
    "inject_match",
]
