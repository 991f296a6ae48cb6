"""msa_tpu — TPU-native multimodal sentiment analysis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Joaonic/multimodal-sentiment-analyzer`` (reference mounted read-only at
``/root/reference``; see SURVEY.md for the full component inventory).

Architecture (TPU-first, not a port):

- ``core``       — canonical emotion taxonomy, typed config tree, result schemas
- ``ops``        — pure jnp/Pallas feature ops (MFCC, rhythm, landmark geometry,
                   pad+LayerNorm normalizers with target dims 27/31/783)
- ``models``     — Flax modules: face landmark net + emotion CNN, audio encoder,
                   BERT trunk + heads, and the fusion MLP (exact reference dims)
- ``pipeline``   — the single jitted end-to-end segment graph
- ``parallel``   — device mesh, shardings, collectives (dp over segments,
                   tp over encoder weights)
- ``host``       — decode/ingest, diarizer + transcriber interfaces
- ``processors`` — public API parity: OfflineProcessor / StreamingProcessor
- ``training``   — AMI preprocessing + fusion trainer (optax)
- ``evaluation`` — metrics/plots harness
"""

__version__ = "0.1.0"

from msa_tpu.core import emotions, config, schema  # noqa: F401
