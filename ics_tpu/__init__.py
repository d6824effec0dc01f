"""ics_tpu — TPU-native image-classification framework.

A ground-up rebuild of the capabilities of
Elmer-Carvalho/Image-Classification-System (human-in-the-loop image
classification over a NextCloud-synced corpus) redesigned TPU-first:

- ``ics_tpu.web``      — from-scratch async HTTP/ASGI framework + server
- ``ics_tpu.db``       — lightweight data-mapper ORM + migration engine
- ``ics_tpu.core``     — settings, timezone, crypto (scrypt/JWT), validators
- ``ics_tpu.crud``     — query layer (keyset pagination, soft deletes)
- ``ics_tpu.api``      — HTTP routes (endpoint-for-endpoint parity with the
                          reference, see SURVEY.md §2 items 17-27)
- ``ics_tpu.sync``     — hybrid NextCloud WebDAV + Activity-API sync engine
- ``ics_tpu.nn``       — pure-JAX functional layer library
- ``ics_tpu.models``   — ResNet-50, ViT-B/16, MobileNetV3-S, EfficientNet-B4
- ``ics_tpu.ops``      — Pallas TPU kernels (fused preproc, flash attention)
- ``ics_tpu.parallel`` — mesh / sharding / pjit layer
- ``ics_tpu.runtime``  — inference engine, dynamic batcher, device pipeline
- ``ics_tpu.train``    — fine-tune loop + orbax checkpointing
- ``ics_tpu.native``   — C++ host shims (libjpeg/libpng decode)
"""

__version__ = "0.3.0"

import os as _os

# Axon remote-TPU tunnel: the PJRT client journals every op — INCLUDING
# full H2D payloads — for session rebind, and journal compaction is off
# by default. Under serving load that retains every transferred batch in
# host RSS forever: measured +6.2 MB/call for a 6.3 MB input, 17 GB RSS
# growth in a 10-minute soak (scripts/soak_e2e.py, r5), and deleting the
# jax arrays recovers nothing. AXON_JOURNAL_COMPACT=1 enables compaction
# (acked journal entries are dropped): the same loop then holds steady
# (~0 KB/call after warm; results verified identical). The client reads
# the env at first device use, so setting it at package import — after
# sitecustomize's pre-main `import jax` — is early enough. Harmless on
# real TPU hosts / CPU (nothing reads it). setdefault: an operator can
# still force it off to debug a rebind.
_os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")
