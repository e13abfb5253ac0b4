"""hifi_fusion_tpu — TPU-native high-fidelity point-cloud fusion.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
REXJJ/high-fidelity-pointcloud-fusion (normal-aware, cylinder-filtered
voxel fusion for eye-in-hand 3D reconstruction), designed TPU-first:
functional hash-grid state in HBM, commutative sum-form statistics,
batched refinement, spatially sharded multi-chip scaling.
"""

from .config import FusionConfig, small_test_config
from .grid import GridState, make_grid, grid_metrics

__version__ = "0.1.0"
