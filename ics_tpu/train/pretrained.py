"""Pretrained-weight import: ecosystem checkpoints -> this repo's trees.

VERDICT r2 item 1: without real initial weights every fine-tune job and
serving "suggestion" starts from noise. The reference has no model tier at
all (labels are human-typed, ``/root/reference/app/api/routes/
classificacoes.py``); this module is the TPU tier's bridge to the public
pretrained ecosystem.

Two on-disk layouts are accepted by :func:`load_pretrained`:

1. **native** — a flat ``.npz`` whose keys are slash-joined paths of this
   repo's ``variables`` tree (``params/stem/conv/w``,
   ``state/stages/0/1/cbr2/bn/mean``, ...), produced by :func:`save_npz`.
   Covers every zoo model including the repo-specific variants
   (``resnet_tiny``, ``vit_b16_h6d128``, ``vit_l16_h8d128``) that have no
   public checkpoints.
2. **torch** — the de-facto standard pretrained layouts, either as a flat
   ``.npz`` (state_dict name -> array) or a ``.pt``/``.pth`` file read
   with ``torch.load(weights_only=True)``:

   - ``resnet18/34/50/101/152``: torchvision ``resnet*`` naming
     (``conv1.weight``, ``layer3.5.bn2.running_var``, ``fc.weight``);
     both bottleneck (conv1-3) and basic (conv1-2) blocks
   - ``vit_b16/vit_l16``: timm ``vit_{base,large}_patch16_*`` naming
     (``blocks.7.attn.qkv.weight``, ``pos_embed``, ...); position
     embeddings for a different grid are bilinearly resized
   - ``mobilenetv3_small``: torchvision ``mobilenet_v3_small``
   - ``efficientnet_b0/b4``: torchvision ``efficientnet_b*``
   - ``convnext_tiny/small``: torchvision ``convnext_*``

   Real-world sources for these exact layouts: torchvision's
   ``IMAGENET1K_V*`` weight files and timm's ``.npz``/``.safetensors``
   exports (convert to flat npz with any torch-side script; this repo's
   models use the matching conventions — symmetric k//2 conv padding,
   torchvision BN eps, exact GELU — so the import is numerically
   faithful, not just shape-compatible).

Head replacement: pass ``num_classes`` to re-initialize the classifier
head (fine-tune onto an ambiente's option set) while keeping the imported
backbone; the head init matches ``model.init``'s distribution.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

import numpy as np

from ics_tpu.models.registry import get_model

logger = logging.getLogger(__name__)


class PretrainedFormatError(ValueError):
    """Checkpoint file/layout problems — the operator's input, not a bug."""


# --------------------------------------------------------------------------
# native flat layout: variables tree <-> {slash/joined/path: array}
# --------------------------------------------------------------------------

def flatten_variables(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    """Nested dict/list pytree -> flat {path: leaf}.

    Leaves are kept as-is (np/jnp arrays — or ShapeDtypeStructs when
    flattening a ``jax.eval_shape`` result for the shape check)."""
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        out[prefix.rstrip("/")] = tree
        return out
    for key, value in items:
        out.update(flatten_variables(value, f"{prefix}{key}/"))
    return out


def unflatten_variables(flat: dict[str, np.ndarray]) -> Any:
    """Inverse of :func:`flatten_variables`.

    A level whose keys are ALL digits rebuilds as a list (block stacks);
    anything else as a dict. Empty-subtree markers are not representable in
    npz — models with empty ``state`` get it restored by the shape check in
    :func:`load_pretrained`.
    """
    root: dict = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(value)

    def rebuild(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [rebuild(node[k]) for k in sorted(node, key=int)]
        return {k: rebuild(v) for k, v in node.items()}

    return rebuild(root)


def save_npz(path: str | Path, variables: dict) -> None:
    """Write ``variables`` as the documented native flat ``.npz``."""
    flat = flatten_variables(variables)
    np.savez(path, **flat)


_SAFETENSORS_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def load_safetensors(path: Path) -> dict[str, np.ndarray]:
    """Minimal safetensors reader (timm/HF's default weight container):
    u64-LE header length + JSON header {name: {dtype, shape,
    data_offsets}} + raw little-endian tensor bytes. No dependency needed
    — the format is deliberately trivial. BF16 is widened to f32 (numpy
    has no bfloat16; the loader casts to f32 anyway)."""
    import json
    import mmap
    import struct

    # mmap instead of read_bytes: each tensor copies out individually, so
    # peak memory is ~one checkpoint instead of raw-bytes + all copies
    # (a ViT-L file is >1 GB on a small host)
    f = path.open("rb")
    try:
        raw = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    except ValueError:
        f.close()
        raise PretrainedFormatError(f"safetensors truncado: {path}")
    f.close()
    if len(raw) < 8:
        raise PretrainedFormatError(f"safetensors truncado: {path}")
    (hlen,) = struct.unpack("<Q", raw[:8])
    if 8 + hlen > len(raw):
        raise PretrainedFormatError(f"safetensors com header inválido: {path}")
    try:
        header = json.loads(raw[8:8 + hlen])
    except ValueError as exc:
        raise PretrainedFormatError(f"safetensors com header inválido: {exc}")
    if not isinstance(header, dict):
        raise PretrainedFormatError(
            f"safetensors com header inválido (não é um objeto): {path}"
        )
    data = memoryview(raw)[8 + hlen:]
    out: dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        try:
            start, end = meta["data_offsets"]
            shape = tuple(meta["shape"])
            dt = meta["dtype"]
        except (TypeError, KeyError, ValueError) as exc:
            raise PretrainedFormatError(
                f"safetensors com entrada inválida ({name}): {exc!r}"
            )
        # offsets must be in-range and consistent: a truncated file would
        # otherwise slice short and surface as an opaque frombuffer error
        if not (isinstance(start, int) and isinstance(end, int)
                and 0 <= start <= end <= len(data)):
            raise PretrainedFormatError(
                f"safetensors truncado/corrupto: offsets {start}:{end} "
                f"fora dos {len(data)} bytes de dados ({name})"
            )
        buf = data[start:end]
        try:
            if dt == "BF16":
                u16 = np.frombuffer(buf, "<u2").astype(np.uint32) << 16
                out[name] = u16.view(np.float32).reshape(shape).copy()
                continue
            np_dt = _SAFETENSORS_DTYPES.get(dt)
            if np_dt is None:
                raise PretrainedFormatError(
                    f"safetensors dtype não suportado: {dt} ({name})"
                )
            out[name] = np.frombuffer(
                buf, np.dtype(np_dt).newbyteorder("<")
            ).reshape(shape).astype(np_dt, copy=True)
        except ValueError as exc:  # frombuffer/reshape size mismatch
            raise PretrainedFormatError(
                f"safetensors corrupto em {name}: {exc}"
            )
    return out


def load_flat(source: str | Path) -> dict[str, np.ndarray]:
    """Read a checkpoint file into a flat name->array dict.

    ``.npz`` via numpy; ``.safetensors`` via the built-in reader;
    ``.pt``/``.pth`` via ``torch.load`` (CPU, weights_only — no pickle
    code execution)."""
    path = Path(source)
    if not path.is_file():
        raise PretrainedFormatError(f"arquivo de pesos não encontrado: {path}")
    if path.suffix == ".safetensors":
        return load_safetensors(path)
    if path.suffix in (".pt", ".pth", ".bin"):
        try:
            import torch
        except Exception as exc:  # pragma: no cover - torch is baked in
            raise PretrainedFormatError(f"torch indisponível para {path}: {exc}")
        state = torch.load(path, map_location="cpu", weights_only=True)
        # training-checkpoint wrappers: torchvision uses 'state_dict',
        # timm/detectron-style save loops use 'model' (+ scalar metadata
        # like 'epoch' beside it)
        for wrapper in ("state_dict", "model"):
            if (isinstance(state, dict) and wrapper in state
                    and isinstance(state[wrapper], dict)):
                state = state[wrapper]
                break
        if not isinstance(state, dict):
            raise PretrainedFormatError(
                f"checkpoint torch não é um state_dict: {path}"
            )
        out = {}
        for k, v in state.items():
            if not hasattr(v, "numpy"):
                # scalar metadata (epoch/step) riding beside the weights
                continue
            if v.dtype == torch.bfloat16:
                # numpy has no bfloat16: widen like the safetensors path
                v = v.float()
            out[k] = v.numpy()
        return out
    with np.load(path) as data:
        return {k: np.asarray(data[k]) for k in data.files}


# --------------------------------------------------------------------------
# torch layout helpers
# --------------------------------------------------------------------------

def _need(flat: dict, key: str) -> np.ndarray:
    if key not in flat:
        raise PretrainedFormatError(
            f"peso ausente no checkpoint: {key} (layout torchvision/timm?)"
        )
    return np.asarray(flat[key], np.float32)


def _conv_w(flat, key):
    # torch OIHW (depthwise: [C,1,kh,kw]) -> HWIO ([kh,kw,1,C] for dw)
    return np.transpose(_need(flat, key), (2, 3, 1, 0))


def _linear(flat, prefix):
    return {
        "w": np.ascontiguousarray(_need(flat, f"{prefix}.weight").T),
        "b": _need(flat, f"{prefix}.bias"),
    }


def _ln(flat, prefix):
    return {
        "gamma": _need(flat, f"{prefix}.weight"),
        "beta": _need(flat, f"{prefix}.bias"),
    }


def _convbn(flat, conv_prefix, bn_prefix, bias: bool = False):
    conv = {"w": _conv_w(flat, f"{conv_prefix}.weight")}
    if bias:
        conv["b"] = _need(flat, f"{conv_prefix}.bias")
    bn_params, bn_state = _bn(flat, bn_prefix)
    return {"conv": conv, "bn": bn_params}, {"bn": bn_state}


def _se(flat, fc1, fc2):
    # torchvision SE uses 1x1 convs ([r,C,1,1]); ours are Dense on pooled
    # activations — same math, conv weight squeezes to [C, r]
    def fc(prefix):
        w = _need(flat, f"{prefix}.weight")
        return {
            "w": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))[0, 0]),
            "b": _need(flat, f"{prefix}.bias"),
        }

    return {"fc1": fc(fc1), "fc2": fc(fc2)}


# --------------------------------------------------------------------------
# per-family mappers (torch state_dict -> this repo's variables)
# --------------------------------------------------------------------------

def _map_resnet(model, flat):
    """torchvision ``resnet*`` (``torchvision/models/resnet.py`` naming)."""
    params: dict = {"stages": []}
    state: dict = {"stages": []}
    params["stem"], state["stem"] = _convbn(flat, "conv1", "bn1")
    for si, blocks in enumerate(model.stages):
        sp, ss = [], []
        for bi, blk in enumerate(blocks):
            pfx = f"layer{si + 1}.{bi}"
            bp, bs = {}, {}
            # Bottleneck (50/101/152) has conv1-3; BasicBlock (18/34) has
            # conv1-2 — same torchvision key scheme either way
            convs = (
                ((1, "cbr1"), (2, "cbr2"), (3, "cbr3"))
                if hasattr(blk, "cbr3")
                else ((1, "cbr1"), (2, "cbr2"))
            )
            for j, name in convs:
                bp[name], bs[name] = _convbn(
                    flat, f"{pfx}.conv{j}", f"{pfx}.bn{j}"
                )
            if blk.downsample:
                bp["down"], bs["down"] = _convbn(
                    flat, f"{pfx}.downsample.0", f"{pfx}.downsample.1"
                )
            sp.append(bp)
            ss.append(bs)
        params["stages"].append(sp)
        state["stages"].append(ss)
    params["head"] = _linear(flat, "fc")
    return {"params": params, "state": state}


def _bn(flat, prefix):
    params = {
        "gamma": _need(flat, f"{prefix}.weight"),
        "beta": _need(flat, f"{prefix}.bias"),
    }
    state = {
        "mean": _need(flat, f"{prefix}.running_mean"),
        "var": _need(flat, f"{prefix}.running_var"),
    }
    return params, state


def _map_regnet(model, flat):
    """torchvision ``regnet_y_*`` (``torchvision/models/regnet.py``
    naming: stem.0/1, trunk_output.block{i}.block{i}-{j}.proj/.f.{a,b,c}
    with conv-BN pairs, .f.se.fc1/fc2 1x1 convs, fc head)."""
    params: dict = {"stages": []}
    state: dict = {"stages": []}
    params["stem"], state["stem"] = _convbn(flat, "stem.0", "stem.1")
    for si, blocks in enumerate(model.stages, start=1):
        sp, ss = [], []
        for bi, blk in enumerate(blocks):
            pfx = f"trunk_output.block{si}.block{si}-{bi}"
            bp, bs = {}, {}
            for name in ("a", "b", "c"):
                bp[name], bs[name] = _convbn(
                    flat, f"{pfx}.f.{name}.0", f"{pfx}.f.{name}.1"
                )
            bp["se"] = _se(flat, f"{pfx}.f.se.fc1", f"{pfx}.f.se.fc2")
            if blk.proj:
                bp["proj"], bs["proj"] = _convbn(
                    flat, f"{pfx}.proj.0", f"{pfx}.proj.1"
                )
            sp.append(bp)
            ss.append(bs)
        params["stages"].append(sp)
        state["stages"].append(ss)
    params["head"] = _linear(flat, "fc")
    return {"params": params, "state": state}


def _map_densenet(model, flat):
    """torchvision ``densenet*`` (``torchvision/models/densenet.py``
    naming: features.denseblock{i}.denselayer{j}.norm/conv{1,2},
    features.transition{i}, features.norm5, classifier)."""
    params: dict = {"stages": [], "down": []}
    state: dict = {"stages": [], "down": []}
    params["stem"], state["stem"] = _convbn(
        flat, "features.conv0", "features.norm0"
    )
    for i, layers in enumerate(model.stages, start=1):
        sp, ss = [], []
        for j in range(1, len(layers) + 1):
            pfx = f"features.denseblock{i}.denselayer{j}"
            bn1p, bn1s = _bn(flat, f"{pfx}.norm1")
            bn2p, bn2s = _bn(flat, f"{pfx}.norm2")
            sp.append({
                "bn1": bn1p,
                "conv1": {"w": _conv_w(flat, f"{pfx}.conv1.weight")},
                "bn2": bn2p,
                "conv2": {"w": _conv_w(flat, f"{pfx}.conv2.weight")},
            })
            ss.append({"bn1": bn1s, "bn2": bn2s})
        params["stages"].append(sp)
        state["stages"].append(ss)
    for i in range(1, len(model.down) + 1):
        pfx = f"features.transition{i}"
        bnp, bns = _bn(flat, f"{pfx}.norm")
        params["down"].append({
            "bn": bnp, "conv": {"w": _conv_w(flat, f"{pfx}.conv.weight")},
        })
        state["down"].append({"bn": bns})
    params["final_bn"], state["final_bn"] = _bn(flat, "features.norm5")
    params["head"] = _linear(flat, "classifier")
    return {"params": params, "state": state}


def _resize_pos_embed(pos, num_patches: int, dim: int):
    """timm ``pos_embed`` [1, 1+G^2, D] -> [1, 1+num_patches, D].

    Grid mismatch (e.g. a 224px/196-patch checkpoint into the 384px/576-
    patch model) is bridged by bilinear resize of the patch grid — the
    standard ViT fine-tuning recipe (Dosovitskiy et al. §3.2)."""
    pos = np.asarray(pos, np.float32)
    if pos.shape[1] == num_patches + 1:
        return pos
    cls, grid = pos[:, :1], pos[:, 1:]
    g_old = int(round(grid.shape[1] ** 0.5))
    g_new = int(round(num_patches ** 0.5))
    if g_old * g_old != grid.shape[1] or g_new * g_new != num_patches:
        raise PretrainedFormatError(
            f"pos_embed com {grid.shape[1]} patches não interpola para "
            f"{num_patches}"
        )
    import jax

    grid = grid.reshape(g_old, g_old, dim)
    grid = np.asarray(
        jax.image.resize(grid, (g_new, g_new, dim), method="bilinear")
    )
    logger.info("pos_embed interpolado: grade %d -> %d", g_old, g_new)
    return np.concatenate([cls, grid.reshape(1, num_patches, dim)], axis=1)


def _map_vit(model, flat):
    """timm ``vit_*_patch16_*`` naming (``timm/models/vision_transformer``)."""
    params = {
        "patch_embed": {
            "w": _conv_w(flat, "patch_embed.proj.weight"),
            "b": _need(flat, "patch_embed.proj.bias"),
        },
        "cls_token": _need(flat, "cls_token"),
        "pos_embed": _resize_pos_embed(
            _need(flat, "pos_embed"), model.num_patches, model.dim
        ),
        "blocks": [],
        "ln": _ln(flat, "norm"),
        "head": _linear(flat, "head"),
    }
    for i in range(len(model.blocks)):
        pfx = f"blocks.{i}"
        params["blocks"].append(
            {
                "ln1": _ln(flat, f"{pfx}.norm1"),
                "attn": {
                    "qkv": _linear(flat, f"{pfx}.attn.qkv"),
                    "proj": _linear(flat, f"{pfx}.attn.proj"),
                },
                "ln2": _ln(flat, f"{pfx}.norm2"),
                "fc1": _linear(flat, f"{pfx}.mlp.fc1"),
                "fc2": _linear(flat, f"{pfx}.mlp.fc2"),
            }
        )
    return {"params": params, "state": {}}


def _map_mobilenetv3(model, flat):
    """torchvision ``mobilenet_v3_small`` naming: ``features.{i}.block.{j}``
    where j skips absent expand/SE stages; classifier.0/.3 are fc1/head."""
    params: dict = {"blocks": []}
    state: dict = {"blocks": []}
    params["stem"], state["stem"] = _convbn(
        flat, "features.0.0", "features.0.1"
    )
    for i, blk in enumerate(model.blocks):
        pfx = f"features.{i + 1}.block"
        j = 0
        bp, bs = {}, {}
        if blk.expand:
            bp["exp"], bs["exp"] = _convbn(flat, f"{pfx}.{j}.0", f"{pfx}.{j}.1")
            j += 1
        bp["dw"], bs["dw"] = _convbn(flat, f"{pfx}.{j}.0", f"{pfx}.{j}.1")
        j += 1
        if blk.se:
            bp["se"] = _se(flat, f"{pfx}.{j}.fc1", f"{pfx}.{j}.fc2")
            j += 1
        bp["proj"], bs["proj"] = _convbn(flat, f"{pfx}.{j}.0", f"{pfx}.{j}.1")
        params["blocks"].append(bp)
        state["blocks"].append(bs)
    last = len(model.blocks) + 1
    params["conv_last"], state["conv_last"] = _convbn(
        flat, f"features.{last}.0", f"features.{last}.1"
    )
    params["fc1"] = _linear(flat, "classifier.0")
    params["head"] = _linear(flat, "classifier.3")
    return {"params": params, "state": state}


def _map_efficientnet(model, flat):
    """torchvision ``efficientnet_b*`` naming: stage-grouped
    ``features.{s}.{r}.block.{j}`` onto this repo's flat block list."""
    from ics_tpu.models.efficientnet import BASE_SPEC, round_repeats

    params: dict = {"blocks": []}
    state: dict = {"blocks": []}
    params["stem"], state["stem"] = _convbn(
        flat, "features.0.0", "features.0.1"
    )
    flat_idx = 0
    for s, (_, _, _, _, repeats) in enumerate(BASE_SPEC, start=1):
        for r in range(round_repeats(repeats, model.depth_mult)):
            blk = model.blocks[flat_idx]
            pfx = f"features.{s}.{r}.block"
            j = 0
            bp, bs = {}, {}
            if blk.expand:
                bp["exp"], bs["exp"] = _convbn(
                    flat, f"{pfx}.{j}.0", f"{pfx}.{j}.1"
                )
                j += 1
            bp["dw"], bs["dw"] = _convbn(flat, f"{pfx}.{j}.0", f"{pfx}.{j}.1")
            j += 1
            bp["se"] = _se(flat, f"{pfx}.{j}.fc1", f"{pfx}.{j}.fc2")
            j += 1
            bp["proj"], bs["proj"] = _convbn(flat, f"{pfx}.{j}.0", f"{pfx}.{j}.1")
            params["blocks"].append(bp)
            state["blocks"].append(bs)
            flat_idx += 1
    if flat_idx != len(model.blocks):
        raise PretrainedFormatError(
            f"estrutura efficientnet não bate: {flat_idx} blocos mapeados, "
            f"modelo tem {len(model.blocks)}"
        )
    last = len(BASE_SPEC) + 1
    params["conv_head"], state["conv_head"] = _convbn(
        flat, f"features.{last}.0", f"features.{last}.1"
    )
    params["head"] = _linear(flat, "classifier.1")
    return {"params": params, "state": state}


def _map_efficientnet_v2(model, flat):
    """torchvision ``efficientnet_v2_s`` naming: features.0 stem,
    features.{1..6} the six stages (fused stages have block.0 [+ block.1
    project]; MBConv stages the v1 0/1/2/3 layout), features.7 head conv,
    classifier.1 the Linear."""
    from ics_tpu.models.efficientnet import FusedMBConv

    params: dict = {"blocks": []}
    state: dict = {"blocks": []}
    params["stem"], state["stem"] = _convbn(
        flat, "features.0.0", "features.0.1"
    )
    flat_idx = 0
    for s, (kind, expand, _, _, _, repeats) in enumerate(model.spec, start=1):
        for r in range(repeats):
            blk = model.blocks[flat_idx]
            pfx = f"features.{s}.{r}.block"
            bp, bs = {}, {}
            if isinstance(blk, FusedMBConv):
                if blk.expand is not None:
                    bp["exp"], bs["exp"] = _convbn(
                        flat, f"{pfx}.0.0", f"{pfx}.0.1"
                    )
                    bp["proj"], bs["proj"] = _convbn(
                        flat, f"{pfx}.1.0", f"{pfx}.1.1"
                    )
                else:
                    bp["proj"], bs["proj"] = _convbn(
                        flat, f"{pfx}.0.0", f"{pfx}.0.1"
                    )
            else:
                bp["exp"], bs["exp"] = _convbn(
                    flat, f"{pfx}.0.0", f"{pfx}.0.1"
                )
                bp["dw"], bs["dw"] = _convbn(
                    flat, f"{pfx}.1.0", f"{pfx}.1.1"
                )
                bp["se"] = _se(flat, f"{pfx}.2.fc1", f"{pfx}.2.fc2")
                bp["proj"], bs["proj"] = _convbn(
                    flat, f"{pfx}.3.0", f"{pfx}.3.1"
                )
            params["blocks"].append(bp)
            state["blocks"].append(bs)
            flat_idx += 1
    # head conv follows the LAST stage: features.<n_stages+1> — hardcoding
    # features.7 was only right for the 6-stage V2-S and made every
    # 7-stage v2_m import fail on a missing features.7.0.weight (review r5)
    head_idx = len(model.spec) + 1
    params["conv_head"], state["conv_head"] = _convbn(
        flat, f"features.{head_idx}.0", f"features.{head_idx}.1"
    )
    params["head"] = _linear(flat, "classifier.1")
    return {"params": params, "state": state}


def _map_convnext(model, flat):
    """torchvision ``convnext_*`` naming: features.0 stem, odd indices are
    block stages, even are (LN, 2x2 conv) downsamples; classifier.0/.2."""
    params: dict = {
        "stem": {
            "w": _conv_w(flat, "features.0.0.weight"),
            "b": _need(flat, "features.0.0.bias"),
        },
        "stem_ln": _ln(flat, "features.0.1"),
        "down": [],
        "stages": [],
        "final_ln": _ln(flat, "classifier.0"),
        "head": _linear(flat, "classifier.2"),
    }
    for i in range(3):
        pfx = f"features.{2 * (i + 1)}"
        params["down"].append(
            {
                "ln": _ln(flat, f"{pfx}.0"),
                "conv": {
                    "w": _conv_w(flat, f"{pfx}.1.weight"),
                    "b": _need(flat, f"{pfx}.1.bias"),
                },
            }
        )
    for si, blocks in enumerate(model.stages):
        stage = []
        for bi in range(len(blocks)):
            pfx = f"features.{2 * si + 1}.{bi}"
            gamma = _need(flat, f"{pfx}.layer_scale")
            stage.append(
                {
                    "dwconv": {
                        "w": _conv_w(flat, f"{pfx}.block.0.weight"),
                        "b": _need(flat, f"{pfx}.block.0.bias"),
                    },
                    "ln": _ln(flat, f"{pfx}.block.2"),
                    "fc1": _linear(flat, f"{pfx}.block.3"),
                    "fc2": _linear(flat, f"{pfx}.block.5"),
                    "gamma": gamma.reshape(-1),  # torch keeps [C,1,1]
                }
            )
        params["stages"].append(stage)
    return {"params": params, "state": {}}


def _map_swin(model, flat):
    """timm ``swin_*_patch4_window7_224`` naming (swin v1,
    ``timm/models/swin_transformer``): ``layers.{s}.blocks.{b}`` +
    ``layers.{s}.downsample``; the relative bias table imports verbatim
    (same (2w-1)^2 x heads layout, index precomputed identically)."""
    params: dict = {
        "patch_embed": {
            "w": _conv_w(flat, "patch_embed.proj.weight"),
            "b": _need(flat, "patch_embed.proj.bias"),
        },
        "patch_norm": _ln(flat, "patch_embed.norm"),
        "stages": [],
        "merges": [],
        "ln": _ln(flat, "norm"),
        "head": _linear(flat, "head.fc")
        if "head.fc.weight" in flat else _linear(flat, "head"),
    }
    for si, stage in enumerate(model.stages):
        blocks = []
        for bi in range(len(stage)):
            pfx = f"layers.{si}.blocks.{bi}"
            blocks.append(
                {
                    "ln1": _ln(flat, f"{pfx}.norm1"),
                    "attn": {
                        "qkv": _linear(flat, f"{pfx}.attn.qkv"),
                        "proj": _linear(flat, f"{pfx}.attn.proj"),
                        "rel_bias": _need(
                            flat,
                            f"{pfx}.attn.relative_position_bias_table",
                        ),
                    },
                    "ln2": _ln(flat, f"{pfx}.norm2"),
                    "fc1": _linear(flat, f"{pfx}.mlp.fc1"),
                    "fc2": _linear(flat, f"{pfx}.mlp.fc2"),
                }
            )
        params["stages"].append(blocks)
    # old timm (<=0.8): PatchMerging lives at the END of stage s
    # (layers.{s}.downsample); timm >= 0.9 (the layout that also
    # introduced head.fc) moved it to the START of stage s+1
    # (layers.{s+1}.downsample, layers.0.downsample is Identity).
    # Same operation at the same position in the compute graph — only the
    # index moved. Detect the layout ONCE by probing stage 0 (per-stage
    # probing would misread layers.1.downsample, which exists in both
    # layouts but holds DIFFERENT merges).
    merge_off = 0 if "layers.0.downsample.reduction.weight" in flat else 1
    for si in range(len(model.merges)):
        dpfx = f"layers.{si + merge_off}.downsample"
        params["merges"].append(
            {
                "norm": _ln(flat, f"{dpfx}.norm"),
                "reduction": {
                    "w": np.asarray(
                        _need(flat, f"{dpfx}.reduction.weight"),
                        np.float32,
                    ).T,  # torch Linear [out, in] -> [in, out]
                },
            }
        )
    return {"params": params, "state": {}}


_FAMILIES = (
    ("resnet", _map_resnet, "fc.weight"),
    # same torchvision key scheme as resnet (layerN.M.convJ/bnJ/fc); the
    # mapper walks the model's own block structure, so grouped/wide inner
    # widths come out right from the checkpoint shapes
    ("resnext", _map_resnet, "fc.weight"),
    ("wide_resnet", _map_resnet, "fc.weight"),
    ("densenet", _map_densenet, "classifier.weight"),
    ("regnet", _map_regnet, "fc.weight"),
    ("vit", _map_vit, "head.weight"),
    ("mobilenetv3", _map_mobilenetv3, "classifier.3.weight"),
    # v2 must precede the v1 prefix match
    ("efficientnet_v2", _map_efficientnet_v2, "classifier.1.weight"),
    ("efficientnet", _map_efficientnet, "classifier.1.weight"),
    ("convnext", _map_convnext, "classifier.2.weight"),
    # newer timm wraps the swin head in ClassifierHead (head.fc.*)
    ("swin", _map_swin, ("head.fc.weight", "head.weight")),
)


def _family(model_name: str):
    for prefix, mapper, head_key in _FAMILIES:
        if model_name.startswith(prefix):
            return mapper, head_key
    raise PretrainedFormatError(
        f"sem mapeador de checkpoint torch para o modelo '{model_name}'"
    )


# --------------------------------------------------------------------------
# entry point
# --------------------------------------------------------------------------

def _tree_shapes(tree, prefix=""):
    return {
        k: tuple(v.shape) for k, v in flatten_variables(tree, prefix).items()
    }


def load_pretrained(
    model_name: str,
    source: str | Path,
    num_classes: Optional[int] = None,
    seed: int = 0,
):
    """Load a checkpoint into ``(model, variables)`` for ``model_name``.

    Layout is auto-detected: keys starting with ``params/``/``state/`` are
    the native flat layout; anything else goes through the torch-layout
    mapper for the model's family. ``num_classes`` (when different from
    the checkpoint's head) re-initializes the classifier head with the
    model's own init distribution — the fine-tune entry point.

    Every leaf is shape-checked against ``jax.eval_shape(model.init)``
    (zero compute) so a wrong file fails loudly before any device work.
    """
    import jax

    spec = get_model(model_name)
    flat = load_flat(source)
    native = any(
        k.startswith(("params/", "state/")) for k in flat
    )
    if native:
        variables = unflatten_variables(flat)
        try:
            head_w = variables["params"]["head"]["w"]
        except (KeyError, TypeError):
            raise PretrainedFormatError(
                "layout nativo sem params/head/w — arquivo truncado?"
            )
        ckpt_classes = int(head_w.shape[-1])
        model = spec.build(num_classes=ckpt_classes)
        variables.setdefault("state", {})
    else:
        mapper, head_key = _family(model_name)
        candidates = (
            head_key if isinstance(head_key, tuple) else (head_key,)
        )
        head_key = next((k for k in candidates if k in flat), None)
        if head_key is None:
            raise PretrainedFormatError(
                f"checkpoint sem {'/'.join(candidates)} — não parece o "
                f"layout torchvision/timm esperado para {model_name}"
            )
        ckpt_classes = int(np.asarray(flat[head_key]).shape[0])
        model = spec.build(num_classes=ckpt_classes)
        variables = mapper(model, flat)

    if num_classes is not None and num_classes != ckpt_classes:
        model = spec.build(num_classes=num_classes)
        # init ONLY the head (every zoo family ends in a Dense self.head
        # whose own init is what model.init uses internally) — a full
        # model.init would random-initialize the whole backbone on the
        # default device (ViT-L: ~300M params over the remote tunnel)
        # just to throw it away
        variables["params"]["head"] = model.head.init(
            jax.random.PRNGKey(seed)
        )
        logger.info(
            "cabeça re-inicializada: %d -> %d classes (backbone pré-treinado)",
            ckpt_classes, num_classes,
        )

    expected = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    exp_shapes = _tree_shapes(expected)
    got_shapes = _tree_shapes(variables)
    if exp_shapes != got_shapes:
        missing = sorted(set(exp_shapes) - set(got_shapes))[:5]
        extra = sorted(set(got_shapes) - set(exp_shapes))[:5]
        wrong = sorted(
            k for k in set(exp_shapes) & set(got_shapes)
            if exp_shapes[k] != got_shapes[k]
        )[:5]
        raise PretrainedFormatError(
            f"checkpoint incompatível com {model_name}: "
            f"faltando={missing} extra={extra} shapes={wrong}"
        )
    import jax.numpy as jnp

    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), variables
    )
    return model, variables
