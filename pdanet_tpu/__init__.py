"""pdanet_tpu — a TPU-native LiDAR 3-D detection framework.

Re-implements the full capability surface of PDANet / OpenPCDet's PDA-SSD
pipeline (reference: Geo3DSmart/PDANet) with a JAX / XLA / Pallas compute
path designed for TPU hardware:

* static-shape point budgets per SA layer (dense ``(B, N, C)`` tensors,
  channels-last for lane-friendly layouts),
* sampling / grouping / rotated-IoU / NMS as vectorized XLA or Pallas
  kernels rather than CUDA scan loops,
* data-parallel scaling through ``jax.sharding.Mesh`` + ``pjit`` instead of
  NCCL DDP,
* a host-side numpy data pipeline feeding fixed-shape device batches.

Public API mirrors pcdet: ``build_network``, dataset builders, YAML configs.
"""

__version__ = "0.1.0"

from . import ops  # noqa: E402,F401
from .config import cfg, cfg_from_list, cfg_from_yaml_file  # noqa: E402,F401
