"""h36x — a TPU-native (JAX / XLA / Pallas / pjit) framework for the Human3.6M
3D human-pose pipeline.

Re-designed from scratch with the capabilities of the reference PyTorch pipeline
(`ferreiraluisa/implementation-phd-lab-vision`, mounted at /root/reference):

- raw Human3.6M ingestion (camera calibration, pose ground truth, video linking)
  -> :mod:`h36x.data.ingest`
- fused decode->crop->resize->normalize->ResNet-50 feature extraction writing
  shuffled feature shards -> :mod:`h36x.extract`
- shard-aware temporal-clip dataloading with deterministic augmentation
  -> :mod:`h36x.data`
- the PHD causal temporal-conv pose model with an HMR-style iterative joint
  regressor -> :mod:`h36x.models.phd`
- data-parallel (+ optional tensor-parallel) MPJPE training over a TPU mesh
  with gradient reduction over ICI -> :mod:`h36x.train`, :mod:`h36x.parallel`
- results / evaluation / visualization tooling -> :mod:`h36x.cli`, :mod:`h36x.viz`

The architecture is idiomatic JAX, not a port: compute lives in jit-compiled
functional transforms over a `jax.sharding.Mesh`, hot ops have Pallas kernels
(:mod:`h36x.ops`), and the host-side runtime (shard IO, decode workers,
prefeed) is double-buffered around the device.
"""

__version__ = "0.1.0"

from h36x import config as config  # noqa: F401
