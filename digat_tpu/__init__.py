"""digat_tpu: a TPU-native news-recommendation framework with DIGAT's capabilities.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the DIGAT
reference (EMNLP-2022 Findings, "DIGAT: Modeling News Recommendation with
Dual-Graph Interaction"):

  * CNN / multi-head self-attention news encoders
  * dual-graph interactive attention (DIGAT) + five ablation graph encoders
  * semantic-augmented news-graph (SAG) offline construction
  * user history-graph construction (compact, reconstructed on device)
  * listwise negative-sampled training, two-stage cached evaluation
  * MIND official metrics (AUC / MRR / nDCG@5 / nDCG@10)

Design is TPU-first: params are pure pytrees, every hot path runs under a
single jit over a `jax.sharding.Mesh`, segment ops are one-hot MXU matmuls,
and the Eq.(8) interactive-GAT hot spot has a fused Pallas kernel.
"""

__version__ = "0.1.0"
