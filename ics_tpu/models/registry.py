"""Model registry: name -> (constructor, preprocessing config).

The API tier and the benchmark select models by name
(``settings.TPU_DEFAULT_MODEL``).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Callable

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class ModelSpec:
    name: str
    build: Callable[..., Any]
    image_size: int
    resize_short: int
    description: str = ""
    # dev/CI-only models (resnet_tiny, vit_tiny, swin_micro): resolvable
    # by name everywhere (tests, dryrun, TPU_DEFAULT_MODEL overrides) but
    # EXCLUDED from the public API surface — a production client must not
    # be able to classify against randomly-initialized toy weights
    dev_only: bool = False


_REGISTRY: dict[str, ModelSpec] = {}


def register_model(name: str, build: Callable, image_size: int,
                   resize_short: int, description: str = "",
                   dev_only: bool = False) -> None:
    _REGISTRY[name] = ModelSpec(
        name, build, image_size, resize_short, description, dev_only
    )


def get_model(name: str) -> ModelSpec:
    _ensure_populated()
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model '{name}'; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def list_models(include_dev: bool = True) -> list[str]:
    """All registered names; ``include_dev=False`` is the PUBLIC surface
    (API routes) — dev/CI models stay reachable by explicit config only."""
    _ensure_populated()
    return sorted(
        n for n, s in _REGISTRY.items() if include_dev or not s.dev_only
    )


_populated = False


def _ensure_populated() -> None:
    global _populated
    if _populated:
        return
    from ics_tpu.models import resnet

    register_model(
        "resnet50", resnet.resnet50, 224, 256,
        "ResNet-50 v1.5 — flagship batched-inference model (BASELINE cfg 2)",
    )
    register_model(
        "resnet101", resnet.resnet101, 224, 256, "ResNet-101 v1.5",
    )
    register_model(
        "resnet18", resnet.resnet18, 224, 256,
        "ResNet-18 — basic-block light variant (torchvision-compatible)",
    )
    register_model(
        "resnet34", resnet.resnet34, 224, 256,
        "ResNet-34 — basic-block variant (torchvision-compatible)",
    )
    register_model(
        "resnet_tiny", resnet.resnet_tiny, 64, 64,
        "ResNet tiny (1 block/stage @64px) — dev/CI serving-stack model",
        dev_only=True,
    )
    try:
        from ics_tpu.models import vit

        register_model(
            "vit_b16", vit.vit_b16, 384, 384,
            "ViT-B/16 @384px — Pallas blockwise attention (BASELINE cfg 3)",
        )
        register_model(
            "vit_l16", vit.vit_l16, 384, 384,
            "ViT-L/16 @384px — large variant, same Pallas attention",
        )
        register_model(
            "vit_s16", vit.vit_s16, 224, 256,
            "ViT-S/16 @224px — small-dataset fine-tune pick "
            "(timm-checkpoint-compatible)",
        )
        register_model(
            "vit_b16_h6d128", vit.vit_b16_h6d128, 384, 384,
            "ViT-B/16 with 6xd=128 heads — full-MXU-width attention "
            "(not weight-compatible with standard ViT-B)",
        )
        register_model(
            "vit_l16_h8d128", vit.vit_l16_h8d128, 384, 384,
            "ViT-L/16 with 8xd=128 heads — full-MXU-width attention",
        )
        register_model(
            "vit_tiny", vit.vit_tiny, 64, 64,
            "ViT tiny (8 blocks @64px) — dev/CI model for the PP/SP "
            "serving stack; not a zoo model",
            dev_only=True,
        )
    except ImportError:
        # every family lives in-repo with no optional deps — an import
        # failure is a REGRESSION, not a missing extra; swallowing it
        # silently made a whole family vanish from the API (review r5)
        logger.exception("família de modelos falhou no import — "
                         "seus modelos ficarão ausentes do registro")
    register_model(
        "resnet152", resnet.resnet152, 224, 256, "ResNet-152 v1.5",
    )
    register_model(
        "resnext50_32x4d", resnet.resnext50_32x4d, 224, 256,
        "ResNeXt-50 32x4d — grouped 3x3s at 2x inner width "
        "(torchvision-checkpoint-compatible)",
    )
    register_model(
        "wide_resnet50_2", resnet.wide_resnet50_2, 224, 256,
        "Wide-ResNet-50-2 — 2x inner bottleneck width, dense convs "
        "(MXU-friendly width scaling; torchvision-checkpoint-compatible)",
    )
    try:
        from ics_tpu.models import convnext

        register_model(
            "convnext_tiny", convnext.convnext_tiny, 224, 256,
            "ConvNeXt-Tiny — modern conv family (LN, 7x7 dw + MXU pointwise)",
        )
        register_model(
            "convnext_small", convnext.convnext_small, 224, 256,
            "ConvNeXt-Small",
        )
    except ImportError:
        # every family lives in-repo with no optional deps — an import
        # failure is a REGRESSION, not a missing extra; swallowing it
        # silently made a whole family vanish from the API (review r5)
        logger.exception("família de modelos falhou no import — "
                         "seus modelos ficarão ausentes do registro")
    try:
        from ics_tpu.models import swin

        register_model(
            "swin_tiny", swin.swin_tiny, 224, 256,
            "Swin-T — hierarchical windowed attention "
            "(timm-checkpoint-compatible)",
        )
        register_model(
            "swin_small", swin.swin_small, 224, 256,
            "Swin-S — deeper Swin variant",
        )
        register_model(
            "swin_base", swin.swin_base, 224, 256,
            "Swin-B — embed 128 (timm-checkpoint-compatible, "
            "87,768,224 params)",
        )
        register_model(
            "swin_micro", swin.swin_micro, 64, 64,
            "Swin micro (2 stages @64px) — dev/CI windowed-attention model",
            dev_only=True,
        )
    except ImportError:
        # every family lives in-repo with no optional deps — an import
        # failure is a REGRESSION, not a missing extra; swallowing it
        # silently made a whole family vanish from the API (review r5)
        logger.exception("família de modelos falhou no import — "
                         "seus modelos ficarão ausentes do registro")
    try:
        from ics_tpu.models import regnet

        register_model(
            "regnet_y_400mf", regnet.regnet_y_400mf, 224, 256,
            "RegNet-Y 400MF — NAS-designed SE-gated grouped bottlenecks "
            "(torchvision-checkpoint-compatible, 4,344,144 params)",
        )
        register_model(
            "regnet_y_1_6gf", regnet.regnet_y_1_6gf, 224, 256,
            "RegNet-Y 1.6GF — larger Y variant "
            "(torchvision-checkpoint-compatible, 11,202,430 params)",
        )
    except ImportError:
        # every family lives in-repo with no optional deps — an import
        # failure is a REGRESSION, not a missing extra; swallowing it
        # silently made a whole family vanish from the API (review r5)
        logger.exception("família de modelos falhou no import — "
                         "seus modelos ficarão ausentes do registro")
    try:
        from ics_tpu.models import densenet

        register_model(
            "densenet121", densenet.densenet121, 224, 256,
            "DenseNet-121 — dense connectivity (pre-act BN folded to FMA "
            "pairs; torchvision-checkpoint-compatible, 7,978,856 params)",
        )
        register_model(
            "densenet169", densenet.densenet169, 224, 256,
            "DenseNet-169 — deeper dense-connectivity variant "
            "(torchvision-checkpoint-compatible, 14,149,480 params)",
        )
    except ImportError:
        # every family lives in-repo with no optional deps — an import
        # failure is a REGRESSION, not a missing extra; swallowing it
        # silently made a whole family vanish from the API (review r5)
        logger.exception("família de modelos falhou no import — "
                         "seus modelos ficarão ausentes do registro")
    try:
        from ics_tpu.models import mobilenetv3

        register_model(
            "mobilenetv3_small", mobilenetv3.mobilenetv3_small, 224, 256,
            "MobileNetV3-Small — single-image latency config (BASELINE cfg 1)",
        )
    except ImportError:
        # every family lives in-repo with no optional deps — an import
        # failure is a REGRESSION, not a missing extra; swallowing it
        # silently made a whole family vanish from the API (review r5)
        logger.exception("família de modelos falhou no import — "
                         "seus modelos ficarão ausentes do registro")
    try:
        from ics_tpu.models import efficientnet

        register_model(
            "efficientnet_b4", efficientnet.efficientnet_b4, 380, 412,
            "EfficientNet-B4 — mixed-resolution bucketing (BASELINE cfg 4)",
        )
        register_model(
            "efficientnet_b0", efficientnet.efficientnet_b0, 224, 256,
            "EfficientNet-B0 — light variant",
        )
        register_model(
            "efficientnet_v2_s", efficientnet.efficientnet_v2_s, 384, 384,
            "EfficientNetV2-S — fused-MBConv early stages (dense k3 convs "
            "on the MXU where depthwise is bandwidth-bound); "
            "torchvision-checkpoint-compatible",
        )
        register_model(
            "efficientnet_v2_m", efficientnet.efficientnet_v2_m, 480, 480,
            "EfficientNetV2-M — larger V2 variant @480px "
            "(torchvision-checkpoint-compatible, 54,139,356 params)",
        )
    except ImportError:
        # every family lives in-repo with no optional deps — an import
        # failure is a REGRESSION, not a missing extra; swallowing it
        # silently made a whole family vanish from the API (review r5)
        logger.exception("família de modelos falhou no import — "
                         "seus modelos ficarão ausentes do registro")
    # only mark complete at the END: a non-ImportError raised mid-way
    # previously left the registry permanently half-populated for the rest
    # of the process; register_model is an idempotent dict write, so the
    # next call simply retries from scratch (review r5)
    _populated = True
