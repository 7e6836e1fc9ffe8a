"""rfnet_tpu — a TPU-native (JAX/XLA/Pallas) point-cloud completion framework.

A from-scratch re-design of the capabilities of RFNet ("RFNet: Recurrent
Forward Network for Dense Point Cloud Completion", ICCV 2021; reference
implementation surveyed in SURVEY.md). The compute path is pure JAX — the
reference's CUDA op zoo (chamfer / approx-EMD / auction-EMD / FPS / grouping /
interpolation, see SURVEY.md §2.1) is re-implemented as XLA-fused primitives
plus Pallas TPU kernels for the hot pairwise-distance scans; the model is a
flax module whose 3-step recurrence compiles to a single jitted graph; scaling
is expressed with `jax.sharding.Mesh` + NamedSharding data parallelism.
"""

__version__ = "0.1.0"

from rfnet_tpu import ops  # noqa: F401
