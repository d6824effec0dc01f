"""One-command rehearsal for the real-pretrained-weights validation
(VERDICT r3 missing #2).

Zero egress here means no actual torchvision/timm weight file has ever
flowed through ``train/pretrained.py`` — the import path is torch-gold
tested against synthesized checkpoints only. The FIRST egress-enabled (or
weight-file-provisioned) environment closes the gap by running exactly
this:

1. For each (model, weight file): find the file under
   ``{TPU_WEIGHTS_DIR}/pretrained/`` — or download it via torchvision's
   public URL when egress exists.
2. Import through ``load_pretrained`` (mapper + shape gate).
3. Run OUR folded bf16 forward and torchvision's reference forward on the
   same input batch and assert top-1 agreement + logit cosine > 0.999 —
   the strongest "suggestions are good" proxy that needs no labeled data.

Degrades to a one-line SKIP per model when neither a local file nor
egress is available. Usage: ``make verify-weights``.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

# torchvision checkpoint URLs (public, stable): model -> (url, tv_builder)
CHECKS = {
    "resnet50": (
        "https://download.pytorch.org/models/resnet50-11ad3fa6.pth",  # V2
        "resnet50",
    ),
    "mobilenetv3_small": (
        "https://download.pytorch.org/models/mobilenet_v3_small-047dcff4.pth",
        "mobilenet_v3_small",
    ),
}


def _weights_dir() -> Path:
    from ics_tpu.core.config import settings

    d = Path(settings.TPU_WEIGHTS_DIR) / "pretrained"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _fetch(model_name: str, url: str) -> Path | None:
    path = _weights_dir() / url.rsplit("/", 1)[-1]
    if path.exists():
        return path
    try:
        import urllib.request

        print(f"{model_name}: downloading {url} ...")
        urllib.request.urlretrieve(url, path)  # noqa: S310 (public URL)
        return path
    except Exception as exc:
        if path.exists():
            path.unlink()
        print(f"{model_name}: SKIP — no local file and download failed "
              f"({type(exc).__name__}: {exc})")
        return None


def _torch_logits(tv_builder: str, path: Path, x_nhwc: np.ndarray) -> np.ndarray:
    import torch

    try:
        import torchvision.models as tvm
    except ImportError:
        raise RuntimeError(
            "torchvision não instalado — instale-o no ambiente de "
            "validação (este script compara contra o forward de referência "
            "da torchvision)"
        )

    model = getattr(tvm, tv_builder)()
    state = torch.load(path, map_location="cpu", weights_only=True)
    model.load_state_dict(state)
    model.eval()
    with torch.no_grad():
        t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
        return model(t).numpy()


def _ours_logits(model_name: str, path: Path, x_nhwc: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    from ics_tpu.train.pretrained import load_pretrained

    model, variables = load_pretrained(model_name, path)
    folded = model.fold(variables)
    return np.asarray(
        model.apply_folded(folded, jnp.asarray(x_nhwc, jnp.bfloat16)),
        np.float32,
    )


def main() -> int:
    failures = 0
    ran = 0
    import_only = 0
    rng = np.random.default_rng(0)
    # normalized-input batch (both forwards consume the SAME preprocessed
    # tensor, so this validates weight import, not the preproc pipeline —
    # preproc has its own PIL-semantics tests)
    x = rng.normal(0.0, 1.0, (4, 224, 224, 3)).astype(np.float32)

    try:
        import torchvision  # noqa: F401

        have_tv = True
    except ImportError:
        have_tv = False

    for model_name, (url, tv_builder) in CHECKS.items():
        path = _fetch(model_name, url)
        if path is None:
            continue
        try:
            ours = _ours_logits(model_name, path, x)
        except Exception as exc:
            print(f"{model_name}: FAIL (import) — {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if not have_tv:
            # weight file present but no reference implementation: the
            # import path + forward still validate (shape gate, finiteness)
            finite = bool(np.isfinite(ours).all())
            print(f"{model_name}: import OK, forward finite={finite} "
                  "(torchvision ausente — comparação de referência pulada)")
            failures += 0 if finite else 1
            ran += 1
            import_only += 1
            continue
        try:
            ref = _torch_logits(tv_builder, path, x)
        except Exception as exc:
            print(f"{model_name}: FAIL (referência) — "
                  f"{type(exc).__name__}: {exc}")
            failures += 1
            continue
        ran += 1
        top1_ours = ours.argmax(-1)
        top1_ref = ref.argmax(-1)
        cos = float(np.mean([
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
            for a, b in zip(ours, ref)
        ]))
        agree = int((top1_ours == top1_ref).sum())
        ok = agree == len(x) and cos > 0.999
        print(f"{model_name}: top1 {agree}/{len(x)} agree, "
              f"logit cosine {cos:.5f} -> {'OK' if ok else 'FAIL'}")
        if not ok:
            failures += 1

    if failures:
        print(f"verify-weights: {failures} FAILURE(S)")
        return 1
    if ran == 0:
        print("verify-weights: SKIP — no checkpoint available (zero egress "
              f"and nothing under {_weights_dir()})")
        return 0
    if import_only == ran:
        print("verify-weights: PASSED (import-only — install torchvision "
              "for the reference-forward comparison)")
    else:
        print("verify-weights: PASSED — real weights round-trip the import "
              "path and match torchvision's forward")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())
