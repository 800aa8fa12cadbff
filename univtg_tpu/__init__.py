"""univtg_tpu: a TPU-native video-language temporal grounding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of showlab/UniVTG
(reference layout documented in SURVEY.md). One unified model family serves
four workloads over pre-extracted clip/text features:

  * Moment Retrieval (MR)      -- regress (start, end) windows for a query
  * Highlight Detection (HL)   -- per-clip saliency curve
  * Video Summarization (QFVS) -- top-k shot selection for concept queries
  * Video-Language Pretraining -- multi-corpus point/interval/curve labels

Design: host-side numpy data pipeline feeding statically-shaped batches into
jitted SPMD compute (pjit over a (dp, tp) mesh); fused attention via Pallas on
TPU; evaluation is host-side numpy with an exact re-implementation of the
reference metric stack.
"""

__version__ = "0.1.0"
