"""ucd_tpu — TPU-native framework for uncertainty-aware contrastive
distillation in class-incremental semantic segmentation.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of ygjwd12345/UCD
(TPAMI 2022), designed TPU-first: one pure jitted train step containing both
model forwards, every loss term and the gradient update; data parallelism via
`jax.sharding` over a device mesh (sync-BN and gradient all-reduce fall out of
SPMD partitioning); the quadratic pixel-contrastive loss as a tiled Pallas
kernel that never materializes the similarity / uncertainty matrices.
"""

__version__ = "0.1.0"

from . import config, tasks

__all__ = ["config", "tasks", "__version__"]
