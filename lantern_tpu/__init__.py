"""LANTERN-TPU: a TPU-native (JAX/XLA/Pallas) framework for relaxed speculative
decoding of visual autoregressive image-generation models.

Re-implements the capabilities of the LANTERN reference (jadohu/LANTERN) with a
TPU-first architecture: static shapes, jit-compiled decode loops, Pallas kernels
for the hot paths, and jax.sharding meshes for multi-chip scaling.

Subpackages
-----------
- ``lantern_tpu.trees``      — draft-tree specs and host-side tree-buffer compiler
- ``lantern_tpu.ops``        — pure-jnp compute ops: sampling, acceptance rules,
                               RoPE, attention (incl. Pallas tree-attention)
- ``lantern_tpu.kv``         — static-shape KV cache with append / rollback
- ``lantern_tpu.models``     — unified decoder (LlamaGen / Chameleon families),
                               EAGLE drafter, VQ-GAN codecs
- ``lantern_tpu.engine``     — AR + speculative decode loops, generation sessions
- ``lantern_tpu.parallel``   — mesh construction and sharding rules
"""

__version__ = "0.1.0"
