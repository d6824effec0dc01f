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
