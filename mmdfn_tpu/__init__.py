"""mmdfn_tpu — a TPU-native JAX/XLA/Pallas framework for Multimodal Dynamic
Fusion Networks (MM-DFN) and the surrounding ERC (emotion recognition in
conversations) model family.

This is a from-scratch rebuild of the capabilities of the reference PyTorch
implementation (zerohd4869/MM-DFN, ICASSP 2022), re-designed TPU-first:

* Everything is statically shaped and batched ``(B, L, ...)`` with explicit
  validity masks — no ragged packed tensors, no per-batch recompiles (length
  bucketing bounds the number of compiled specializations).
* The per-forward "dynamic" cross-modal graph (reference
  ``code/model_mm.py:122-180``) is a fully vectorized batched dense adjacency
  builder that XLA fuses; message passing is batched dense matmul on the MXU.
* Deep GCNII stacks (reference ``code/model_GCN.py:412-488``) compile to a
  single ``lax.scan`` over stacked layer parameters.
* Recurrent context encoders (cuDNN GRU/LSTM in the reference) are
  ``lax.scan`` cells; the CRN speaker encoder's python gather/scatter loops
  (reference ``code/model.py:1040-1154``) become argsort-based permutations.
* Multi-chip scaling uses ``jax.sharding.Mesh`` + data-parallel sharding of
  the dialogue batch axis; the graph is block-diagonal per dialogue so DP is
  the natural (and communication-minimal) parallelism for this model family.
"""

__version__ = "0.1.0"
