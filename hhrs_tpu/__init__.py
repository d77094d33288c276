"""hhrs_tpu — TPU-native hybrid hotel recommendation framework.

A brand-new two-stage recommender (hybrid candidate generation from a
social graph + DCN-R ranking) built TPU-first in JAX/XLA/Pallas/pjit.
Functionally equivalent to — but not a port of — the PyTorch/FastAPI
reference ``Krist-Marrakesh/Hybrid-Hotel-Recommendation-System-Based-on-
Friends-Recommendations`` (see SURVEY.md for the component-by-component
inventory this build tracks).

Package layout:
  data/       host-side ingest, shared featurizer, preprocessing artifacts
  ops/        compute ops (cross layer, residual block, top-k, MMR) — jnp + Pallas
  models/     DCN-R model assembly (pure functional param pytrees)
  train/      pjit'ed trainer, metrics, artifact export
  hpo/        in-house TPE/median-pruner hyperparameter search (optuna-compatible API)
  retrieval/  on-device candidate generation engine (social graph + similarity)
  parallel/   mesh helpers, row-sharded embeddings with all-to-all exchange
  serve/      two-stage serving engine + REST front
  runtime/    native (C++) runtime pieces: ingest, CSR graph builder
  utils/      logging, prng threading, profiling
"""

__version__ = "0.1.0"
