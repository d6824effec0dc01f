"""Device mesh + sharding layer.

Scaling design (SURVEY.md §2.3): the serving/training unit is a
``jax.sharding.Mesh`` with axes

- ``data``  — batch-dim data parallelism (the primary axis for CNN/ViT
  inference at this scale; collectives ride ICI)
- ``model`` — tensor parallelism seam: classifier head + (for ViT) attention
  heads/MLP are sharded along this axis. ResNet-50/ViT-B fit one chip, so
  this axis exists to make TP a config change, not a rewrite.

All parameters are plain pytrees; sharding is applied with
``jax.device_put`` + ``NamedSharding`` and programs are ``jax.jit``-ed with
explicit in/out shardings so XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axes: Optional[Sequence[str]] = None,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        # default: 2D (data, model) when we have >=4 devices, else pure DP
        if n >= 4 and n % 2 == 0:
            shape, axes = (n // 2, 2), ("data", "model")
        else:
            shape, axes = (n,), ("data",)
    if axes is None:
        axes = ("data", "model")[: len(shape)]
    arr = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, axes)


_distributed_initialized = False


def maybe_initialize_distributed(settings) -> bool:
    """Multi-host (DCN) init via jax.distributed (SURVEY.md §2.3 comm row).

    The reference's only "distribution" is HTTP client-server; for the TPU
    build, multi-host pods coordinate through jax.distributed so GSPMD can
    place collectives across DCN. No-op unless TPU_COORDINATOR_ADDRESS is
    configured; idempotent across callers (serving + train CLI)."""
    global _distributed_initialized
    if _distributed_initialized or not settings.TPU_COORDINATOR_ADDRESS:
        return _distributed_initialized
    jax.distributed.initialize(
        coordinator_address=settings.TPU_COORDINATOR_ADDRESS,
        num_processes=settings.TPU_NUM_PROCESSES,
        process_id=settings.TPU_PROCESS_ID,
    )
    _distributed_initialized = True
    return True


def mesh_from_settings(settings) -> Optional[Mesh]:
    """Build the serving/training mesh from TPU_MESH_SHAPE / TPU_MESH_AXES.

    - "auto" (default): pure-DP mesh over every visible device; None on a
      single device (plain jit, no GSPMD overhead).
    - explicit "4,2": exactly that shape over TPU_MESH_AXES; raises if the
      host doesn't have enough devices — silently serving on fewer chips
      than configured would be an invisible capacity loss.
    """
    maybe_initialize_distributed(settings)
    shape = settings.get_mesh_shape()
    devices = jax.devices()
    pp = int(getattr(settings, "TPU_PP_STAGES", 0) or 0)
    if pp >= 2:
        # pipeline-parallel serving: a ('pp',)-axis mesh over the first
        # TPU_PP_STAGES devices; the engine routes the transformer trunk
        # through parallel/pipeline.py. An explicit TPU_MESH_SHAPE at the
        # same time is ambiguous (DPxPP in one mesh is not supported —
        # compose DP via TPU_SERVING_REPLICAS instead), so fail loudly.
        if shape is not None:
            raise RuntimeError(
                "TPU_PP_STAGES e TPU_MESH_SHAPE explícito são mutuamente "
                "exclusivos — use TPU_SERVING_REPLICAS para compor DP com PP"
            )
        if pp > len(devices):
            raise RuntimeError(
                f"TPU_PP_STAGES={pp} precisa de {pp} devices, "
                f"mas só {len(devices)} visíveis"
            )
        return make_mesh(shape=(pp,), axes=("pp",), devices=devices[:pp])
    if shape is None:
        if len(devices) <= 1:
            return None
        return make_mesh(shape=(len(devices),), axes=("data",), devices=devices)
    need = int(np.prod(shape))
    if need <= 1:
        return None
    if need > len(devices):
        raise RuntimeError(
            f"TPU_MESH_SHAPE={settings.TPU_MESH_SHAPE} needs {need} devices, "
            f"but only {len(devices)} are visible"
        )
    axes = settings.get_mesh_axes()[: len(shape)]
    return make_mesh(shape=shape, axes=axes, devices=devices)


def train_mesh_from_settings(settings, devices=None) -> Optional[Mesh]:
    """Dedicated-device training mesh from ``TPU_TRAIN_DEVICES``.

    Serving and background fine-tune jobs share the host; without
    isolation a training step competes with serving batches for every
    chip. ``TPU_TRAIN_DEVICES``:

    - ``""`` (default): no mesh — training uses jit's default device
      (status quo; fine single-chip).
    - ``"all"``: pure-DP mesh over every visible device.
    - ``"a:b"`` (python slice over ``jax.devices()``, e.g. ``"6:8"``):
      pure-DP mesh over that contiguous slice — chips OUTSIDE the slice
      never see training work, so serving SLAs survive a running job.
      A 1-device slice still builds a mesh: it PINS placement (plain jit
      would put training on device 0 alongside serving).
    """
    spec = (settings.TPU_TRAIN_DEVICES or "").strip().lower()
    if not spec:
        return None
    devices = list(devices) if devices is not None else jax.devices()
    if spec == "all":
        group = devices
    else:
        if ":" not in spec:
            raise ValueError(
                f"TPU_TRAIN_DEVICES={settings.TPU_TRAIN_DEVICES!r}: expected "
                "'', 'all' or a 'start:end' slice (a bare number is "
                "ambiguous — write '6:7' for device 6 only)"
            )
        try:
            start_s, _, end_s = spec.partition(":")
            start = int(start_s) if start_s else 0
            end = int(end_s) if end_s else len(devices)
        except ValueError:
            raise ValueError(
                f"TPU_TRAIN_DEVICES={settings.TPU_TRAIN_DEVICES!r}: expected "
                "'', 'all' or a 'start:end' slice"
            )
        if start < 0 or end > len(devices) or start >= end:
            # loud like mesh_from_settings: silently training on fewer
            # chips than configured is an invisible capacity loss
            raise RuntimeError(
                f"TPU_TRAIN_DEVICES={settings.TPU_TRAIN_DEVICES!r} is out of "
                f"range for {len(devices)} visible device(s)"
            )
        group = devices[start:end]
    if not group:
        raise RuntimeError(
            f"TPU_TRAIN_DEVICES={settings.TPU_TRAIN_DEVICES!r} selects no "
            f"device (have {len(devices)})"
        )
    mesh = make_mesh(shape=(len(group),), axes=("data",), devices=group)
    # isolation only holds when serving doesn't ALSO cover the train slice;
    # with TPU_MESH_SHAPE=auto serving spans every chip. Warn loudly — the
    # operator meant to isolate (e.g. TPU_MESH_SHAPE=6 + TPU_TRAIN_DEVICES
    # =6:8 for a v5e-8) but this config doesn't.
    serving = None
    if hasattr(settings, "get_mesh_shape"):
        try:
            serving = mesh_from_settings(settings)
        except Exception:  # mis-sized explicit shape raises on its own path
            serving = None
    if serving is not None:
        overlap = {d.id for d in serving.devices.flat} & {
            d.id for d in mesh.devices.flat
        }
        if overlap:
            import logging

            logging.getLogger(__name__).warning(
                "TPU_TRAIN_DEVICES=%s overlaps the serving mesh on device(s) "
                "%s — training WILL contend with serving there. For real "
                "isolation shrink TPU_MESH_SHAPE so serving stays off the "
                "training slice.",
                settings.TPU_TRAIN_DEVICES, sorted(overlap),
            )
    return mesh


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; rest replicated."""
    spec = [None] * ndim
    spec[0] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_head_for_tp(mesh: Mesh, params: dict) -> dict:
    """Annotate the classifier head for tensor parallelism along 'model'.

    head = {"w": [features, classes], "b": [classes]} -> classes axis sharded.
    Returns a pytree of shardings matching ``params`` (head TP, rest
    replicated) usable as ``in_shardings`` / ``device_put`` targets.
    """
    rep = replicated_sharding(mesh)
    shardings = jax.tree_util.tree_map(lambda _: rep, params)
    if "model" in mesh.axis_names and "head" in params:
        tp = int(mesh.shape["model"])
        # per-ambiente trained heads have arbitrary num_classes (count of
        # opcoes); a classes dim not divisible by the 'model' axis cannot be
        # laid out — device_put would raise and 500 the route. The head is
        # tiny, so the always-correct fallback is replication.
        classes = None
        for leaf_name in ("w", "b"):
            leaf = params["head"].get(leaf_name)
            if leaf is not None and hasattr(leaf, "shape") and len(leaf.shape):
                classes = int(leaf.shape[-1])
                break
        if tp > 1 and (classes is None or classes % tp):
            import logging

            logging.getLogger(__name__).info(
                "head classes dim (%s) not divisible by model axis (%d): "
                "serving the head replicated instead of TP-sharded",
                classes, tp,
            )
            return shardings
        head = {}
        if "w" in params["head"]:
            head["w"] = NamedSharding(mesh, P(None, "model"))
        if "b" in params["head"]:
            head["b"] = NamedSharding(mesh, P("model"))
        shardings["head"] = head
    return shardings


def apply_shardings(tree, shardings):
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
