"""demovlp_tpu — a TPU-native (JAX/Flax/pjit/Pallas) video-language framework.

A from-scratch rebuild of the capabilities of showlab/DemoVLP ("Revitalize
Region Feature for Democratizing Video-Language Pre-training",
arXiv:2203.07720): dual-encoder video-text retrieval over pre-extracted
object-region features, with video-QA and multiple-choice heads, designed
TPU-first:

* SPMD data parallelism over a `jax.sharding.Mesh` (no process groups; the
  per-device replica logic of the reference's DDP/NCCL stack is replaced by
  GSPMD sharding annotations and XLA collectives over ICI).
* Global-negative contrastive training by construction: the jitted train
  step computes the full-batch similarity matrix, so XLA inserts the
  all-gathers the reference kept dormant (reference
  trainer/trainer_dist.py:13-31).
* Pallas kernels for the two hot ops: the divided space-time attention of
  the region tower and the cross-modal attention of the local (RWA) loss.
* Fixed shapes everywhere so every step hits the same compiled executable.
"""

__version__ = "0.1.0"
