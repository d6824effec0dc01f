"""Pretrained-weight import (ics_tpu/train/pretrained.py; VERDICT r2 item 1).

Three layers of evidence, all hermetic:

1. **Torch-anchored gold tests** — build small *torch* models with the
   torchvision/timm module layout, export their ``state_dict``, import via
   the mappers, and assert the JAX forward matches the torch forward. This
   pins the real conventions (OIHW->HWIO, [out,in]->[in,out], symmetric
   stride-2 padding, BN eps/folding, exact GELU, qkv head packing) against
   an independent implementation — not against ourselves.
2. **Synthesized-checkpoint round-trips** — for every zoo model, synthesize
   a checkpoint (native flat npz, and the torch layout via an inverse
   exporter for the standard families), import it, and assert the imported
   tree equals the directly-constructed params leaf-for-leaf (which implies
   forward equivalence: same function, same values).
3. **Product wiring** — head re-initialization for a new class count,
   loud failures on wrong files, and the training-job entry point.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ics_tpu.models.registry import get_model, list_models  # noqa: E402
from ics_tpu.train import pretrained as pt  # noqa: E402


def _tree_allclose(a, b, atol=0.0):
    fa, fb = pt.flatten_variables(a), pt.flatten_variables(b)
    assert sorted(fa) == sorted(fb), (
        sorted(set(fa) ^ set(fb))[:10]
    )
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fa[k], np.float32), np.asarray(fb[k], np.float32),
            atol=atol, rtol=0, err_msg=k,
        )


# ==========================================================================
# 1. torch-anchored gold tests
# ==========================================================================

torch = pytest.importorskip("torch")
tnn = torch.nn


def _randomize_bn(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.modules.batchnorm._BatchNorm):
            m.running_mean.copy_(
                torch.tensor(rng.normal(size=m.num_features), dtype=torch.float32)
            )
            m.running_var.copy_(
                torch.tensor(
                    rng.uniform(0.5, 2.0, size=m.num_features),
                    dtype=torch.float32,
                )
            )


def _state_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class _TorchBottleneck(tnn.Module):
    # attribute names match torchvision.models.resnet.Bottleneck so the
    # state_dict keys are the real thing; groups/base_width follow the
    # torchvision inner-width formula (ResNeXt / Wide-ResNet variants)
    def __init__(self, in_ch, width, stride=1, groups=1, base_width=64):
        super().__init__()
        out_ch = width * 4
        inner = int(width * (base_width / 64.0)) * groups
        self.conv1 = tnn.Conv2d(in_ch, inner, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(inner)
        self.conv2 = tnn.Conv2d(inner, inner, 3, stride, padding=1,
                                bias=False, groups=groups)
        self.bn2 = tnn.BatchNorm2d(inner)
        self.conv3 = tnn.Conv2d(inner, out_ch, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                tnn.BatchNorm2d(out_ch),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idn)


class _TorchResNet(tnn.Module):
    def __init__(self, block_counts=(1, 1, 1, 1), num_classes=5,
                 groups=1, base_width=64):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, padding=1)
        ch = 64
        layers = []
        for si, count in enumerate(block_counts):
            width = 64 * 2**si
            stride = 1 if si == 0 else 2
            blocks = []
            for b in range(count):
                blocks.append(
                    _TorchBottleneck(ch, width, stride if b == 0 else 1,
                                     groups=groups, base_width=base_width)
                )
                ch = width * 4
            layers.append(tnn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers
        self.fc = tnn.Linear(ch, num_classes)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.maxpool(y)
        y = self.layer4(self.layer3(self.layer2(self.layer1(y))))
        return self.fc(y.mean(dim=(2, 3)))


class _TorchBasicBlock(tnn.Module):
    # attribute names match torchvision.models.resnet.BasicBlock
    def __init__(self, in_ch, width, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, width, 3, stride, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.downsample = None
        if stride != 1 or in_ch != width:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, width, 1, stride, bias=False),
                tnn.BatchNorm2d(width),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class _TorchBasicResNet(tnn.Module):
    """resnet18-shaped (basic blocks, expansion 1), tiny block counts."""

    def __init__(self, block_counts=(1, 1, 1, 1), num_classes=5):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, padding=1)
        ch = 64
        layers = []
        for si, count in enumerate(block_counts):
            width = 64 * 2**si
            stride = 1 if si == 0 else 2
            blocks = []
            for b in range(count):
                blocks.append(
                    _TorchBasicBlock(ch, width, stride if b == 0 else 1)
                )
                ch = width
            layers.append(tnn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers
        self.fc = tnn.Linear(ch, num_classes)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.maxpool(y)
        y = self.layer4(self.layer3(self.layer2(self.layer1(y))))
        return self.fc(y.mean(dim=(2, 3)))


class TestTorchGold:
    def test_basic_block_resnet_matches_torch(self):
        """ResNet-18/34 family: torchvision BasicBlock layout (conv1-2,
        stride on the first 3x3) through the same _map_resnet mapper."""
        from ics_tpu.models.resnet import BasicBlock, ResNet

        rng = np.random.default_rng(3)
        tm = _TorchBasicResNet()
        with torch.no_grad():
            _randomize_bn(tm, rng)
        tm.eval()
        flat = _state_np(tm)

        model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5,
                       block_cls=BasicBlock)
        variables = pt._map_resnet(model, flat)

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got, _ = model.apply(variables, jnp.asarray(x), training=False)
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-4)

        folded = model.fold(variables)
        got_f = model.apply_folded(folded, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got_f), ref, atol=5e-4, rtol=1e-3)

    def test_resnet_forward_matches_torch(self):
        """Full stem->stages->head numerics vs an independent torch build
        with real torchvision naming — padding alignment at stride 2 and
        BN-eval semantics included. Both raw apply() and the BN-folded
        serving path must match."""
        from ics_tpu.models.resnet import ResNet

        rng = np.random.default_rng(0)
        tm = _TorchResNet()
        with torch.no_grad():
            _randomize_bn(tm, rng)
        tm.eval()
        flat = _state_np(tm)

        model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
        variables = pt._map_resnet(model, flat)

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got, _ = model.apply(variables, jnp.asarray(x), training=False)
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-4)

        folded = model.fold(variables)
        got_f = model.apply_folded(folded, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got_f), ref, atol=5e-4, rtol=1e-3)

    def test_resnext_grouped_bottleneck_matches_torch(self):
        """ResNeXt/Wide family: grouped 3x3 + scaled inner width through
        the same torchvision key scheme and _map_resnet mapper (groups=4,
        base_width=16 keeps the CI model tiny — the formula is the same
        one resnext50_32x4d/wide_resnet50_2 use)."""
        from ics_tpu.models.resnet import ResNet

        rng = np.random.default_rng(7)
        tm = _TorchResNet(groups=4, base_width=16)
        with torch.no_grad():
            _randomize_bn(tm, rng)
        tm.eval()
        flat = _state_np(tm)

        model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5,
                       groups=4, base_width=16)
        variables = pt._map_resnet(model, flat)

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got, _ = model.apply(variables, jnp.asarray(x), training=False)
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-4)

        folded = model.fold(variables)
        got_f = model.apply_folded(folded, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got_f), ref, atol=5e-4, rtol=1e-3)

    def test_vit_block_matches_torch(self):
        """timm transformer-block conventions: qkv packing [3*D] split as
        (3, heads, head_dim), exact GELU, pre-LN residuals."""
        from ics_tpu.models.vit import TransformerBlock

        dim, heads, seq = 32, 4, 9
        rng = np.random.default_rng(1)

        class TorchBlock(tnn.Module):
            def __init__(self):
                super().__init__()
                self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
                self.qkv = tnn.Linear(dim, dim * 3)
                self.proj = tnn.Linear(dim, dim)
                self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
                self.fc1 = tnn.Linear(dim, dim * 4)
                self.fc2 = tnn.Linear(dim * 4, dim)

            def forward(self, x):
                b, n, _ = x.shape
                y = self.norm1(x)
                qkv = self.qkv(y).reshape(b, n, 3, heads, dim // heads)
                qkv = qkv.permute(2, 0, 3, 1, 4)  # timm: [3, B, H, N, hd]
                q, k, v = qkv[0], qkv[1], qkv[2]
                attn = (q @ k.transpose(-2, -1)) * (dim // heads) ** -0.5
                attn = attn.softmax(dim=-1)
                y = (attn @ v).transpose(1, 2).reshape(b, n, dim)
                x = x + self.proj(y)
                y = self.norm2(x)
                y = self.fc2(tnn.functional.gelu(self.fc1(y)))
                return x + y

        tb = TorchBlock().eval()
        flat = {
            f"blocks.0.{'attn.' if k in ('qkv', 'proj') else ''}{k2}": v
            for k, k2, v in [
                (k.split(".")[0], k, v) for k, v in _state_np(tb).items()
            ]
        }
        # rename mlp linears to the timm names
        flat = {
            k.replace("blocks.0.fc1", "blocks.0.mlp.fc1").replace(
                "blocks.0.fc2", "blocks.0.mlp.fc2"
            ): v
            for k, v in flat.items()
        }
        params = {
            "ln1": pt._ln(flat, "blocks.0.norm1"),
            "attn": {
                "qkv": pt._linear(flat, "blocks.0.attn.qkv"),
                "proj": pt._linear(flat, "blocks.0.attn.proj"),
            },
            "ln2": pt._ln(flat, "blocks.0.norm2"),
            "fc1": pt._linear(flat, "blocks.0.mlp.fc1"),
            "fc2": pt._linear(flat, "blocks.0.mlp.fc2"),
        }
        params = jax.tree_util.tree_map(jnp.asarray, params)
        blk = TransformerBlock(dim, heads)
        x = rng.standard_normal((2, seq, dim)).astype(np.float32)
        with torch.no_grad():
            ref = tb(torch.tensor(x)).numpy()
        got = blk.apply(params, jnp.asarray(x), use_flash=False)
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)

    def test_swin_shifted_block_matches_torch(self):
        """SW-MSA gold: hand-built torch block following the published
        Swin v1 algorithm (cyclic shift, window partition, relative
        position bias, region mask) — catches layout/indexing drift in
        the JAX shifted-window machinery that structural tests can't."""
        from ics_tpu.models.swin import SwinBlock

        dim, heads, window, shift, grid = 16, 2, 4, 2, 8
        torch.manual_seed(3)

        class TorchSwinBlock(tnn.Module):
            def __init__(self):
                super().__init__()
                self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
                self.qkv = tnn.Linear(dim, dim * 3)
                self.proj = tnn.Linear(dim, dim)
                self.rel_bias = tnn.Parameter(
                    torch.randn((2 * window - 1) ** 2, heads) * 0.02
                )
                self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
                self.fc1 = tnn.Linear(dim, dim * 4)
                self.fc2 = tnn.Linear(dim * 4, dim)
                coords = torch.stack(
                    torch.meshgrid(
                        torch.arange(window), torch.arange(window),
                        indexing="ij",
                    )
                ).flatten(1)
                rel = coords[:, :, None] - coords[:, None, :]
                rel = rel.permute(1, 2, 0).contiguous()
                rel[:, :, 0] += window - 1
                rel[:, :, 1] += window - 1
                rel[:, :, 0] *= 2 * window - 1
                self.register_buffer("rel_index", rel.sum(-1))
                img = torch.zeros(1, grid, grid, 1)
                cnt = 0
                bounds = (slice(0, -window), slice(-window, -shift),
                          slice(-shift, None))
                for hs in bounds:
                    for ws in bounds:
                        img[:, hs, ws, :] = cnt
                        cnt += 1
                mw = self._partition(img).squeeze(-1)
                am = mw.unsqueeze(1) - mw.unsqueeze(2)
                am = am.masked_fill(am != 0, -1e4).masked_fill(am == 0, 0.0)
                self.register_buffer("attn_mask", am)

            @staticmethod
            def _partition(x):
                b, h, w, c = x.shape
                x = x.view(b, h // window, window, w // window, window, c)
                return x.permute(0, 1, 3, 2, 4, 5).reshape(
                    -1, window * window, c
                )

            def forward(self, x):
                b = x.shape[0]
                shortcut = x
                y = self.norm1(x)
                y = torch.roll(y, (-shift, -shift), dims=(1, 2))
                wins = self._partition(y)
                bn, ww, _ = wins.shape
                qkv = self.qkv(wins).reshape(
                    bn, ww, 3, heads, dim // heads
                ).permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                attn = (q @ k.transpose(-2, -1)) * (dim // heads) ** -0.5
                bias = self.rel_bias[self.rel_index.view(-1)].view(
                    ww, ww, heads
                ).permute(2, 0, 1)
                attn = attn + bias.unsqueeze(0)
                n_w = self.attn_mask.shape[0]
                attn = attn.view(bn // n_w, n_w, heads, ww, ww) + (
                    self.attn_mask.unsqueeze(0).unsqueeze(2)
                )
                attn = attn.view(bn, heads, ww, ww).softmax(dim=-1)
                y = (attn @ v).transpose(1, 2).reshape(bn, ww, dim)
                y = self.proj(y)
                n = grid // window
                y = y.view(b, n, n, window, window, dim)
                y = y.permute(0, 1, 3, 2, 4, 5).reshape(b, grid, grid, dim)
                y = torch.roll(y, (shift, shift), dims=(1, 2))
                x = shortcut + y
                y = self.norm2(x)
                return x + self.fc2(tnn.functional.gelu(self.fc1(y)))

        tb = TorchSwinBlock().eval()

        def lin(m):
            return {"w": m.weight.detach().numpy().T.copy(),
                    "b": m.bias.detach().numpy().copy()}

        def ln(m):
            return {"gamma": m.weight.detach().numpy().copy(),
                    "beta": m.bias.detach().numpy().copy()}

        params = jax.tree_util.tree_map(jnp.asarray, {
            "ln1": ln(tb.norm1),
            "attn": {
                "qkv": lin(tb.qkv),
                "proj": lin(tb.proj),
                "rel_bias": tb.rel_bias.detach().numpy().copy(),
            },
            "ln2": ln(tb.norm2),
            "fc1": lin(tb.fc1),
            "fc2": lin(tb.fc2),
        })
        blk = SwinBlock(dim, heads, window, shift, grid)
        x = np.random.default_rng(4).standard_normal(
            (2, grid, grid, dim)
        ).astype(np.float32)
        with torch.no_grad():
            ref = tb(torch.tensor(x)).numpy()
        got = blk.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=1e-4)

    def test_convnext_block_matches_torch(self):
        """torchvision CNBlock: dw conv w/ bias, LN, Linear pair, exact
        GELU, [C,1,1] layer_scale."""
        from ics_tpu.models.convnext import ConvNeXtBlock

        dim = 16
        rng = np.random.default_rng(2)

        class TorchCNBlock(tnn.Module):
            def __init__(self):
                super().__init__()
                self.block = tnn.Sequential(
                    tnn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True),
                    tnn.Identity(),  # Permute in torchvision (no params)
                    tnn.LayerNorm(dim, eps=1e-6),
                    tnn.Linear(dim, 4 * dim),
                    tnn.GELU(),
                    tnn.Linear(4 * dim, dim),
                )
                self.layer_scale = tnn.Parameter(
                    torch.ones(dim, 1, 1) * 1e-2
                )

            def forward(self, x):  # x NCHW
                y = self.block[0](x).permute(0, 2, 3, 1)
                y = self.block[2](y)
                y = self.block[3](y)
                y = self.block[4](y)
                y = self.block[5](y)
                y = y.permute(0, 3, 1, 2) * self.layer_scale
                return x + y

        tb = TorchCNBlock().eval()
        flat = {f"features.1.0.{k}": v for k, v in _state_np(tb).items()}
        params = {
            "dwconv": {
                "w": pt._conv_w(flat, "features.1.0.block.0.weight"),
                "b": pt._need(flat, "features.1.0.block.0.bias"),
            },
            "ln": pt._ln(flat, "features.1.0.block.2"),
            "fc1": pt._linear(flat, "features.1.0.block.3"),
            "fc2": pt._linear(flat, "features.1.0.block.5"),
            "gamma": pt._need(flat, "features.1.0.layer_scale").reshape(-1),
        }
        params = jax.tree_util.tree_map(jnp.asarray, params)
        blk = ConvNeXtBlock(dim)
        x = rng.standard_normal((2, 8, 8, dim)).astype(np.float32)
        with torch.no_grad():
            ref = tb(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got = blk.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(got), np.transpose(ref, (0, 2, 3, 1)),
            atol=2e-5, rtol=1e-4,
        )

    def test_regnet_matches_torch(self):
        """RegNet micro twin with REAL torchvision naming (trunk_output.
        block{i}.block{i}-{j}.f.a/b/c + f.se + proj): SE-gated grouped
        bottleneck numerics, stride-2 stage openings, BN-folded serving."""
        from collections import OrderedDict

        from ics_tpu.models.regnet import RegNet

        gw = 8  # group width

        def conv_bn(w_in, w_out, k, stride=1, groups=1):
            return tnn.Sequential(
                tnn.Conv2d(w_in, w_out, k, stride, padding=k // 2,
                           groups=groups, bias=False),
                tnn.BatchNorm2d(w_out),
            )

        class _TorchSE(tnn.Module):
            def __init__(self, ch, squeeze):
                super().__init__()
                self.fc1 = tnn.Conv2d(ch, squeeze, 1)
                self.fc2 = tnn.Conv2d(squeeze, ch, 1)

            def forward(self, x):
                y = x.mean((2, 3), keepdim=True)
                y = torch.sigmoid(self.fc2(torch.relu(self.fc1(y))))
                return x * y

        class _TorchF(tnn.Module):
            def __init__(self, w_in, w_out, stride):
                super().__init__()
                self.a = conv_bn(w_in, w_out, 1)
                self.b = conv_bn(w_out, w_out, 3, stride,
                                 groups=w_out // gw)
                self.se = _TorchSE(w_out, max(1, int(round(0.25 * w_in))))
                self.c = conv_bn(w_out, w_out, 1)

            def forward(self, x):
                y = torch.relu(self.a(x))
                y = torch.relu(self.b(y))
                return self.c(self.se(y))

        class _TorchBlock(tnn.Module):
            def __init__(self, w_in, w_out, stride):
                super().__init__()
                self.proj = (conv_bn(w_in, w_out, 1, stride)
                             if (w_in != w_out or stride != 1) else None)
                self.f = _TorchF(w_in, w_out, stride)

            def forward(self, x):
                idn = x if self.proj is None else self.proj(x)
                return torch.relu(self.f(x) + idn)

        class _TorchRegNet(tnn.Module):
            def __init__(self, depths=(1, 1), widths=(16, 32),
                         num_classes=5):
                super().__init__()
                self.stem = conv_bn(3, 32, 3, 2)
                trunk = OrderedDict()
                w_in = 32
                for si, (d, w_out) in enumerate(
                    zip(depths, widths), start=1
                ):
                    stage = OrderedDict()
                    for bi in range(d):
                        stage[f"block{si}-{bi}"] = _TorchBlock(
                            w_in, w_out, 2 if bi == 0 else 1
                        )
                        w_in = w_out
                    trunk[f"block{si}"] = tnn.Sequential(stage)
                self.trunk_output = tnn.Sequential(trunk)
                self.fc = tnn.Linear(w_in, num_classes)

            def forward(self, x):
                y = torch.relu(self.stem(x))
                y = self.trunk_output(y)
                return self.fc(y.mean(dim=(2, 3)))

        rng = np.random.default_rng(13)
        tm = _TorchRegNet()
        with torch.no_grad():
            _randomize_bn(tm, rng)
        tm.eval()
        flat = _state_np(tm)

        model = RegNet((1, 1), (16, 32), gw, num_classes=5)
        variables = pt._map_regnet(model, flat)

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got, _ = model.apply(variables, jnp.asarray(x), training=False)
        np.testing.assert_allclose(np.asarray(got), ref,
                                   atol=2e-4, rtol=1e-4)

        folded = model.fold(variables)
        got_f = model.apply_folded(folded, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got_f), ref,
                                   atol=5e-4, rtol=1e-3)

    def test_densenet_matches_torch(self):
        """DenseNet micro twin with REAL torchvision naming (features.
        denseblock{i}.denselayer{j}.norm/conv{1,2}, transition, norm5):
        pre-activation BN semantics, concat growth, avg-pool transition
        and the standalone-BN fold all against torch numerics."""
        from collections import OrderedDict

        from ics_tpu.models.densenet import DenseNet

        growth, init_f = 8, 16

        class _TorchDenseLayer(tnn.Module):
            def __init__(self, in_ch):
                super().__init__()
                self.norm1 = tnn.BatchNorm2d(in_ch)
                self.conv1 = tnn.Conv2d(in_ch, 4 * growth, 1, bias=False)
                self.norm2 = tnn.BatchNorm2d(4 * growth)
                self.conv2 = tnn.Conv2d(4 * growth, growth, 3, padding=1,
                                        bias=False)

            def forward(self, x):
                y = self.conv1(torch.relu(self.norm1(x)))
                y = self.conv2(torch.relu(self.norm2(y)))
                return torch.cat([x, y], 1)

        class _TorchTransition(tnn.Module):
            def __init__(self, in_ch, out_ch):
                super().__init__()
                self.norm = tnn.BatchNorm2d(in_ch)
                self.conv = tnn.Conv2d(in_ch, out_ch, 1, bias=False)

            def forward(self, x):
                y = self.conv(torch.relu(self.norm(x)))
                return torch.nn.functional.avg_pool2d(y, 2, 2)

        class _TorchDenseNet(tnn.Module):
            def __init__(self, block_config=(2, 2), num_classes=5):
                super().__init__()
                feats = OrderedDict()
                feats["conv0"] = tnn.Conv2d(3, init_f, 7, 2, padding=3,
                                            bias=False)
                feats["norm0"] = tnn.BatchNorm2d(init_f)
                feats["relu0"] = tnn.ReLU()
                feats["pool0"] = tnn.MaxPool2d(3, 2, padding=1)
                ch = init_f
                for i, count in enumerate(block_config, start=1):
                    block = OrderedDict()
                    for j in range(1, count + 1):
                        block[f"denselayer{j}"] = _TorchDenseLayer(ch)
                        ch += growth
                    feats[f"denseblock{i}"] = tnn.Sequential(block)
                    if i < len(block_config):
                        feats[f"transition{i}"] = _TorchTransition(
                            ch, ch // 2
                        )
                        ch //= 2
                feats["norm5"] = tnn.BatchNorm2d(ch)
                self.features = tnn.Sequential(feats)
                self.classifier = tnn.Linear(ch, num_classes)

            def forward(self, x):
                y = torch.relu(self.features(x))
                return self.classifier(y.mean(dim=(2, 3)))

        rng = np.random.default_rng(11)
        tm = _TorchDenseNet()
        with torch.no_grad():
            _randomize_bn(tm, rng)
        tm.eval()
        flat = _state_np(tm)

        model = DenseNet((2, 2), growth=growth, init_features=init_f,
                         num_classes=5)
        variables = pt._map_densenet(model, flat)

        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got, _ = model.apply(variables, jnp.asarray(x), training=False)
        np.testing.assert_allclose(np.asarray(got), ref,
                                   atol=2e-4, rtol=1e-4)

        folded = model.fold(variables)
        got_f = model.apply_folded(folded, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got_f), ref,
                                   atol=5e-4, rtol=1e-3)

    def test_depthwise_stride2_and_se_match_torch(self):
        """MobileNet/EfficientNet primitives: 5x5/s2 depthwise conv with
        symmetric padding, BN eps=1e-3, conv-style SE, hard activations."""
        from ics_tpu.nn.blocks import ConvBN, SEBlock
        from ics_tpu.nn.layers import hard_sigmoid, hard_swish

        rng = np.random.default_rng(3)
        c = 24
        tconv = tnn.Conv2d(c, c, 5, 2, padding=2, groups=c, bias=False)
        tbn = tnn.BatchNorm2d(c, eps=1e-3)
        seq = tnn.Sequential(tconv, tbn)
        with torch.no_grad():
            _randomize_bn(seq, rng)
        seq.eval()
        flat = {f"m.0.{k}": v for k, v in _state_np(tconv).items()}
        flat.update({f"m.1.{k}": v for k, v in _state_np(tbn).items()})
        params, state = pt._convbn(flat, "m.0", "m.1")
        params = jax.tree_util.tree_map(jnp.asarray, params)
        state = jax.tree_util.tree_map(jnp.asarray, state)
        cb = ConvBN(c, c, 5, 2, groups=c, padding=2, eps=1e-3)
        x = rng.standard_normal((2, 10, 10, c)).astype(np.float32)
        with torch.no_grad():
            ref = seq(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got, _ = cb.apply(params, state, jnp.asarray(x), training=False)
        np.testing.assert_allclose(
            np.asarray(got), np.transpose(ref, (0, 2, 3, 1)),
            atol=2e-5, rtol=1e-4,
        )
        # folded path too (BN-fold compatibility)
        got_f = cb.apply_folded(cb.fold(params, state), jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(got_f), np.transpose(ref, (0, 2, 3, 1)),
            atol=5e-5, rtol=1e-3,
        )

        # SE: torchvision uses 1x1 convs on [B,C,1,1]; ours Dense on [B,C]
        tfc1 = tnn.Conv2d(c, 8, 1)
        tfc2 = tnn.Conv2d(8, c, 1)
        flat = {f"se.fc1.{k}": v for k, v in _state_np(tfc1).items()}
        flat.update({f"se.fc2.{k}": v for k, v in _state_np(tfc2).items()})
        se_params = jax.tree_util.tree_map(
            jnp.asarray, pt._se(flat, "se.fc1", "se.fc2")
        )
        se = SEBlock(c, 8, gate="hard")
        with torch.no_grad():
            xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
            scale = tnn.functional.hardsigmoid(
                tfc2(torch.relu(tfc1(xt.mean(dim=(2, 3), keepdim=True))))
            )
            ref_se = (xt * scale).numpy()
        got_se = se.apply(se_params, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(got_se), np.transpose(ref_se, (0, 2, 3, 1)),
            atol=2e-5, rtol=1e-4,
        )

        # activation definitions themselves
        v = np.linspace(-6, 6, 101).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(hard_sigmoid(jnp.asarray(v))),
            tnn.functional.hardsigmoid(torch.tensor(v)).numpy(), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(hard_swish(jnp.asarray(v))),
            tnn.functional.hardswish(torch.tensor(v)).numpy(), atol=1e-6,
        )


# ==========================================================================
# 2. synthesized-checkpoint round-trips (every zoo model)
# ==========================================================================

def _small_classes(name):
    return 6


def _np_variables(variables):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), variables)


class TestNativeLayout:
    # in-memory flatten/unflatten round-trip for EVERY registry model
    @pytest.mark.parametrize("name", list_models())
    def test_flatten_roundtrip_zoo(self, name):
        spec = get_model(name)
        model = spec.build(num_classes=_small_classes(name))
        variables = _np_variables(model.init(jax.random.PRNGKey(0)))
        rebuilt = pt.unflatten_variables(pt.flatten_variables(variables))
        rebuilt.setdefault("state", {})
        _tree_allclose(variables, rebuilt)

    def test_disk_roundtrip_and_forward(self, tmp_path):
        """save_npz -> load_pretrained -> identical tree AND identical
        forward (the documented on-disk native format)."""
        spec = get_model("resnet_tiny")
        model = spec.build(num_classes=4)
        variables = model.init(jax.random.PRNGKey(1))
        path = tmp_path / "resnet_tiny.npz"
        pt.save_npz(path, variables)
        model2, loaded = pt.load_pretrained("resnet_tiny", path)
        _tree_allclose(_np_variables(variables), _np_variables(loaded))
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((1, 64, 64, 3)),
            jnp.float32,
        )
        a, _ = model.apply(variables, x)
        b, _ = model2.apply(loaded, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_head_reinit_keeps_backbone(self, tmp_path):
        spec = get_model("mobilenetv3_small")
        model = spec.build(num_classes=10)
        variables = model.init(jax.random.PRNGKey(3))
        path = tmp_path / "mbv3.npz"
        pt.save_npz(path, variables)
        model2, loaded = pt.load_pretrained(
            "mobilenetv3_small", path, num_classes=7, seed=5
        )
        assert model2.num_classes == 7
        assert loaded["params"]["head"]["w"].shape[-1] == 7
        # backbone untouched
        np.testing.assert_allclose(
            np.asarray(loaded["params"]["stem"]["conv"]["w"]),
            np.asarray(variables["params"]["stem"]["conv"]["w"]),
        )

    def test_wrong_model_is_loud(self, tmp_path):
        spec = get_model("resnet_tiny")
        model = spec.build(num_classes=4)
        pt.save_npz(tmp_path / "r.npz", model.init(jax.random.PRNGKey(0)))
        with pytest.raises(pt.PretrainedFormatError, match="incompatível"):
            pt.load_pretrained("mobilenetv3_small", tmp_path / "r.npz")

    def test_missing_file_is_loud(self, tmp_path):
        with pytest.raises(pt.PretrainedFormatError, match="não encontrado"):
            pt.load_pretrained("resnet_tiny", tmp_path / "nope.npz")


# -- inverse exporters: our tree -> the torch/timm state_dict layout -------

def _inv_conv(w):
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def _inv_convbn(out, params, state, conv, bn, bias=False):
    out[f"{conv}.weight"] = _inv_conv(params["conv"]["w"])
    if bias:
        out[f"{conv}.bias"] = np.asarray(params["conv"]["b"])
    out[f"{bn}.weight"] = np.asarray(params["bn"]["gamma"])
    out[f"{bn}.bias"] = np.asarray(params["bn"]["beta"])
    out[f"{bn}.running_mean"] = np.asarray(state["bn"]["mean"])
    out[f"{bn}.running_var"] = np.asarray(state["bn"]["var"])


def _inv_bn(out, params, state, prefix):
    # standalone (pre-activation) BatchNorm — DenseNet norm1/norm2/norm5
    out[f"{prefix}.weight"] = np.asarray(params["gamma"])
    out[f"{prefix}.bias"] = np.asarray(params["beta"])
    out[f"{prefix}.running_mean"] = np.asarray(state["mean"])
    out[f"{prefix}.running_var"] = np.asarray(state["var"])


def _inv_linear(out, params, prefix):
    out[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(params["w"]).T)
    out[f"{prefix}.bias"] = np.asarray(params["b"])


def _inv_ln(out, params, prefix):
    out[f"{prefix}.weight"] = np.asarray(params["gamma"])
    out[f"{prefix}.bias"] = np.asarray(params["beta"])


def _inv_se(out, params, fc1, fc2):
    for name, prefix in (("fc1", fc1), ("fc2", fc2)):
        w = np.asarray(params[name]["w"])  # [C, r]
        out[f"{prefix}.weight"] = np.ascontiguousarray(w.T)[:, :, None, None]
        out[f"{prefix}.bias"] = np.asarray(params[name]["b"])


def _export_resnet(model, variables):
    p, s = variables["params"], variables["state"]
    out = {}
    _inv_convbn(out, p["stem"], s["stem"], "conv1", "bn1")
    for si, blocks in enumerate(model.stages):
        for bi, blk in enumerate(blocks):
            pfx = f"layer{si + 1}.{bi}"
            convs = (
                ((1, "cbr1"), (2, "cbr2"), (3, "cbr3"))
                if hasattr(blk, "cbr3")
                else ((1, "cbr1"), (2, "cbr2"))  # BasicBlock (18/34)
            )
            for j, name in convs:
                _inv_convbn(
                    out, p["stages"][si][bi][name], s["stages"][si][bi][name],
                    f"{pfx}.conv{j}", f"{pfx}.bn{j}",
                )
            if blk.downsample:
                _inv_convbn(
                    out, p["stages"][si][bi]["down"], s["stages"][si][bi]["down"],
                    f"{pfx}.downsample.0", f"{pfx}.downsample.1",
                )
    _inv_linear(out, p["head"], "fc")
    return out


def _export_vit(model, variables):
    p = variables["params"]
    out = {
        "patch_embed.proj.weight": _inv_conv(p["patch_embed"]["w"]),
        "patch_embed.proj.bias": np.asarray(p["patch_embed"]["b"]),
        "cls_token": np.asarray(p["cls_token"]),
        "pos_embed": np.asarray(p["pos_embed"]),
    }
    for i, bp in enumerate(p["blocks"]):
        pfx = f"blocks.{i}"
        _inv_ln(out, bp["ln1"], f"{pfx}.norm1")
        _inv_linear(out, bp["attn"]["qkv"], f"{pfx}.attn.qkv")
        _inv_linear(out, bp["attn"]["proj"], f"{pfx}.attn.proj")
        _inv_ln(out, bp["ln2"], f"{pfx}.norm2")
        _inv_linear(out, bp["fc1"], f"{pfx}.mlp.fc1")
        _inv_linear(out, bp["fc2"], f"{pfx}.mlp.fc2")
    _inv_ln(out, p["ln"], "norm")
    _inv_linear(out, p["head"], "head")
    return out


def _export_mobilenetv3(model, variables):
    p, s = variables["params"], variables["state"]
    out = {}
    _inv_convbn(out, p["stem"], s["stem"], "features.0.0", "features.0.1")
    for i, blk in enumerate(model.blocks):
        pfx = f"features.{i + 1}.block"
        j = 0
        if blk.expand:
            _inv_convbn(out, p["blocks"][i]["exp"], s["blocks"][i]["exp"],
                        f"{pfx}.{j}.0", f"{pfx}.{j}.1")
            j += 1
        _inv_convbn(out, p["blocks"][i]["dw"], s["blocks"][i]["dw"],
                    f"{pfx}.{j}.0", f"{pfx}.{j}.1")
        j += 1
        if blk.se:
            _inv_se(out, p["blocks"][i]["se"], f"{pfx}.{j}.fc1", f"{pfx}.{j}.fc2")
            j += 1
        _inv_convbn(out, p["blocks"][i]["proj"], s["blocks"][i]["proj"],
                    f"{pfx}.{j}.0", f"{pfx}.{j}.1")
    last = len(model.blocks) + 1
    _inv_convbn(out, p["conv_last"], s["conv_last"],
                f"features.{last}.0", f"features.{last}.1")
    _inv_linear(out, p["fc1"], "classifier.0")
    _inv_linear(out, p["head"], "classifier.3")
    return out


def _export_efficientnet(model, variables):
    from ics_tpu.models.efficientnet import BASE_SPEC, round_repeats

    p, s = variables["params"], variables["state"]
    out = {}
    _inv_convbn(out, p["stem"], s["stem"], "features.0.0", "features.0.1")
    idx = 0
    for st, (_, _, _, _, repeats) in enumerate(BASE_SPEC, start=1):
        for r in range(round_repeats(repeats, model.depth_mult)):
            blk = model.blocks[idx]
            pfx = f"features.{st}.{r}.block"
            j = 0
            if blk.expand:
                _inv_convbn(out, p["blocks"][idx]["exp"], s["blocks"][idx]["exp"],
                            f"{pfx}.{j}.0", f"{pfx}.{j}.1")
                j += 1
            _inv_convbn(out, p["blocks"][idx]["dw"], s["blocks"][idx]["dw"],
                        f"{pfx}.{j}.0", f"{pfx}.{j}.1")
            j += 1
            _inv_se(out, p["blocks"][idx]["se"], f"{pfx}.{j}.fc1", f"{pfx}.{j}.fc2")
            j += 1
            _inv_convbn(out, p["blocks"][idx]["proj"], s["blocks"][idx]["proj"],
                        f"{pfx}.{j}.0", f"{pfx}.{j}.1")
            idx += 1
    last = len(BASE_SPEC) + 1
    _inv_convbn(out, p["conv_head"], s["conv_head"],
                f"features.{last}.0", f"features.{last}.1")
    _inv_linear(out, p["head"], "classifier.1")
    return out


def _export_efficientnet_v2(model, variables):
    from ics_tpu.models.efficientnet import FusedMBConv

    p, s = variables["params"], variables["state"]
    out = {}
    _inv_convbn(out, p["stem"], s["stem"], "features.0.0", "features.0.1")
    idx = 0
    for st, (_, _, _, _, _, repeats) in enumerate(model.spec, start=1):
        for r in range(repeats):
            blk = model.blocks[idx]
            pfx = f"features.{st}.{r}.block"
            bp, bs = p["blocks"][idx], s["blocks"][idx]
            if isinstance(blk, FusedMBConv):
                if blk.expand is not None:
                    _inv_convbn(out, bp["exp"], bs["exp"],
                                f"{pfx}.0.0", f"{pfx}.0.1")
                    _inv_convbn(out, bp["proj"], bs["proj"],
                                f"{pfx}.1.0", f"{pfx}.1.1")
                else:
                    _inv_convbn(out, bp["proj"], bs["proj"],
                                f"{pfx}.0.0", f"{pfx}.0.1")
            else:
                _inv_convbn(out, bp["exp"], bs["exp"],
                            f"{pfx}.0.0", f"{pfx}.0.1")
                _inv_convbn(out, bp["dw"], bs["dw"],
                            f"{pfx}.1.0", f"{pfx}.1.1")
                _inv_se(out, bp["se"], f"{pfx}.2.fc1", f"{pfx}.2.fc2")
                _inv_convbn(out, bp["proj"], bs["proj"],
                            f"{pfx}.3.0", f"{pfx}.3.1")
            idx += 1
    # torchvision places the head conv after the LAST stage — for the
    # 7-stage v2_m that is features.8, not features.7 (the exporter
    # previously shared the importer's hardcoded index, masking the bug)
    head_idx = len(model.spec) + 1
    _inv_convbn(out, p["conv_head"], s["conv_head"],
                f"features.{head_idx}.0", f"features.{head_idx}.1")
    _inv_linear(out, p["head"], "classifier.1")
    return out


def _export_convnext(model, variables):
    p = variables["params"]
    out = {
        "features.0.0.weight": _inv_conv(p["stem"]["w"]),
        "features.0.0.bias": np.asarray(p["stem"]["b"]),
    }
    _inv_ln(out, p["stem_ln"], "features.0.1")
    for i in range(3):
        pfx = f"features.{2 * (i + 1)}"
        _inv_ln(out, p["down"][i]["ln"], f"{pfx}.0")
        out[f"{pfx}.1.weight"] = _inv_conv(p["down"][i]["conv"]["w"])
        out[f"{pfx}.1.bias"] = np.asarray(p["down"][i]["conv"]["b"])
    for si, blocks in enumerate(p["stages"]):
        for bi, bp in enumerate(blocks):
            pfx = f"features.{2 * si + 1}.{bi}"
            out[f"{pfx}.block.0.weight"] = _inv_conv(bp["dwconv"]["w"])
            out[f"{pfx}.block.0.bias"] = np.asarray(bp["dwconv"]["b"])
            _inv_ln(out, bp["ln"], f"{pfx}.block.2")
            _inv_linear(out, bp["fc1"], f"{pfx}.block.3")
            _inv_linear(out, bp["fc2"], f"{pfx}.block.5")
            out[f"{pfx}.layer_scale"] = np.asarray(bp["gamma"])[:, None, None]
    _inv_ln(out, p["final_ln"], "classifier.0")
    _inv_linear(out, p["head"], "classifier.2")
    return out


def _export_swin(model, variables, new_timm: bool = False):
    """Export in one of the two REAL timm layouts (review r4: the old
    hybrid head.fc + old-index downsample export matched no timm version):

    - old timm (<= 0.8): ``head.*`` + PatchMerging at the END of stage s
      (``layers.{s}.downsample``)
    - timm >= 0.9: ``head.fc.*`` + PatchMerging at the START of stage s+1
      (``layers.{s+1}.downsample``; layers.0.downsample is Identity)
    """
    p = variables["params"]
    out = {
        "patch_embed.proj.weight": _inv_conv(p["patch_embed"]["w"]),
        "patch_embed.proj.bias": np.asarray(p["patch_embed"]["b"]),
    }
    _inv_ln(out, p["patch_norm"], "patch_embed.norm")
    for si, blocks in enumerate(p["stages"]):
        for bi, bp in enumerate(blocks):
            pfx = f"layers.{si}.blocks.{bi}"
            _inv_ln(out, bp["ln1"], f"{pfx}.norm1")
            _inv_linear(out, bp["attn"]["qkv"], f"{pfx}.attn.qkv")
            _inv_linear(out, bp["attn"]["proj"], f"{pfx}.attn.proj")
            out[f"{pfx}.attn.relative_position_bias_table"] = np.asarray(
                bp["attn"]["rel_bias"]
            )
            _inv_ln(out, bp["ln2"], f"{pfx}.norm2")
            _inv_linear(out, bp["fc1"], f"{pfx}.mlp.fc1")
            _inv_linear(out, bp["fc2"], f"{pfx}.mlp.fc2")
        if si < len(p["merges"]):
            dpfx = (f"layers.{si + 1}.downsample" if new_timm
                    else f"layers.{si}.downsample")
            _inv_ln(out, p["merges"][si]["norm"], f"{dpfx}.norm")
            out[f"{dpfx}.reduction.weight"] = np.ascontiguousarray(
                np.asarray(p["merges"][si]["reduction"]["w"]).T
            )
    _inv_ln(out, p["ln"], "norm")
    _inv_linear(out, p["head"], "head.fc" if new_timm else "head")
    return out


def _export_regnet(model, variables):
    """torchvision ``regnet_y_*`` naming (trunk_output.block{i}
    .block{i}-{j}.f.{a,b,c}/.f.se/.proj, stem.0/1, fc)."""
    p, s = variables["params"], variables["state"]
    out = {}
    _inv_convbn(out, p["stem"], s["stem"], "stem.0", "stem.1")
    for si, blocks in enumerate(model.stages, start=1):
        for bi, blk in enumerate(blocks):
            pfx = f"trunk_output.block{si}.block{si}-{bi}"
            bp, bs = p["stages"][si - 1][bi], s["stages"][si - 1][bi]
            for name in ("a", "b", "c"):
                _inv_convbn(out, bp[name], bs[name],
                            f"{pfx}.f.{name}.0", f"{pfx}.f.{name}.1")
            _inv_se(out, bp["se"], f"{pfx}.f.se.fc1", f"{pfx}.f.se.fc2")
            if blk.proj:
                _inv_convbn(out, bp["proj"], bs["proj"],
                            f"{pfx}.proj.0", f"{pfx}.proj.1")
    _inv_linear(out, p["head"], "fc")
    return out


def _export_densenet(model, variables):
    """torchvision ``densenet*`` naming (features.denseblock{i}
    .denselayer{j}.norm/conv{1,2}, transition{i}, norm5, classifier)."""
    p, s = variables["params"], variables["state"]
    out = {}
    _inv_convbn(out, p["stem"], s["stem"], "features.conv0",
                "features.norm0")
    for i, layers in enumerate(model.stages, start=1):
        for j in range(1, len(layers) + 1):
            pfx = f"features.denseblock{i}.denselayer{j}"
            lp, ls = p["stages"][i - 1][j - 1], s["stages"][i - 1][j - 1]
            _inv_bn(out, lp["bn1"], ls["bn1"], f"{pfx}.norm1")
            out[f"{pfx}.conv1.weight"] = _inv_conv(lp["conv1"]["w"])
            _inv_bn(out, lp["bn2"], ls["bn2"], f"{pfx}.norm2")
            out[f"{pfx}.conv2.weight"] = _inv_conv(lp["conv2"]["w"])
    for i in range(1, len(model.down) + 1):
        pfx = f"features.transition{i}"
        _inv_bn(out, p["down"][i - 1]["bn"], s["down"][i - 1]["bn"],
                f"{pfx}.norm")
        out[f"{pfx}.conv.weight"] = _inv_conv(p["down"][i - 1]["conv"]["w"])
    _inv_bn(out, p["final_bn"], s["final_bn"], "features.norm5")
    _inv_linear(out, p["head"], "classifier")
    return out


_EXPORTERS = {
    "resnet": _export_resnet,
    "densenet": _export_densenet,
    "regnet": _export_regnet,
    # same torchvision key scheme; the exporter walks the model's own
    # block tree, so grouped/wide inner widths export correctly
    "resnext": _export_resnet,
    "wide_resnet": _export_resnet,
    "vit": _export_vit,
    "mobilenetv3": _export_mobilenetv3,
    "efficientnet_v2": _export_efficientnet_v2,  # before the v1 prefix
    "efficientnet": _export_efficientnet,
    "convnext": _export_convnext,
    "swin": _export_swin,
}


class TestTorchLayoutRoundtrip:
    """Synthesize the torch/timm layout for EVERY zoo model and assert the
    mapper reconstructs the exact tree (=> forward equivalence)."""

    @pytest.mark.parametrize("name", list_models())
    def test_roundtrip(self, name, tmp_path):
        spec = get_model(name)
        model = spec.build(num_classes=_small_classes(name))
        variables = _np_variables(model.init(jax.random.PRNGKey(7)))
        family = next(f for f in _EXPORTERS if name.startswith(f))
        flat = _EXPORTERS[family](model, variables)
        # through the real file path + auto-detection for the small models;
        # in-memory for the >100M-param ones (disk round-trip is covered,
        # structure is what varies per model)
        n_params = sum(
            int(np.prod(v.shape))
            for v in pt.flatten_variables(variables["params"]).values()
        )
        if n_params < 100_000_000:
            path = tmp_path / f"{name}.npz"
            np.savez(path, **flat)
            model2, loaded = pt.load_pretrained(name, path)
        else:
            mapper, _ = pt._family(name)
            loaded = mapper(model, flat)
            loaded.setdefault("state", {})
        expected = dict(variables)
        expected.setdefault("state", {})
        loaded = dict(loaded)
        loaded.setdefault("state", {})
        _tree_allclose(
            {"params": expected["params"], "state": expected["state"]},
            {"params": _np_variables(loaded["params"]),
             "state": _np_variables(loaded["state"])},
        )

    @pytest.mark.parametrize("name", ["swin_micro", "swin_tiny"])
    def test_swin_new_timm_layout_roundtrip(self, name, tmp_path):
        """timm >= 0.9 layout (head.fc + downsample at the START of stage
        s+1) — review r4: this is the only layout real head.fc checkpoints
        ship in, and the old mapper rejected every one of them."""
        spec = get_model(name)
        model = spec.build(num_classes=_small_classes(name))
        variables = _np_variables(model.init(jax.random.PRNGKey(9)))
        flat = _export_swin(model, variables, new_timm=True)
        assert "head.fc.weight" in flat
        assert "layers.0.downsample.reduction.weight" not in flat
        assert "layers.1.downsample.reduction.weight" in flat
        path = tmp_path / f"{name}_newtimm.npz"
        np.savez(path, **flat)
        model2, loaded = pt.load_pretrained(name, path)
        loaded = dict(loaded)
        loaded.setdefault("state", {})
        _tree_allclose(
            {"params": variables["params"]},
            {"params": _np_variables(loaded["params"])},
        )


class TestContainers:
    """The three real-world weight containers all feed load_pretrained:
    flat .npz, torch .pth (weights_only), and safetensors (built-in
    reader — timm/HF's default)."""

    @staticmethod
    def _write_safetensors(path, flat):
        import json
        import struct

        header = {}
        blobs = []
        off = 0
        dmap = {np.float32: "F32", np.int64: "I64", np.float16: "F16"}
        for name, arr in flat.items():
            arr = np.ascontiguousarray(arr)
            b = arr.tobytes()
            header[name] = {
                "dtype": dmap[arr.dtype.type],
                "shape": list(arr.shape),
                "data_offsets": [off, off + len(b)],
            }
            blobs.append(b)
            off += len(b)
        hj = json.dumps(header).encode()
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", len(hj)))
            f.write(hj)
            for b in blobs:
                f.write(b)

    def test_safetensors_roundtrip(self, tmp_path):
        spec = get_model("resnet_tiny")
        model = spec.build(num_classes=4)
        variables = _np_variables(model.init(jax.random.PRNGKey(11)))
        flat = _export_resnet(model, variables)
        path = tmp_path / "r.safetensors"
        self._write_safetensors(path, flat)
        _, loaded = pt.load_pretrained("resnet_tiny", path)
        _tree_allclose(variables, _np_variables(loaded))

    def test_safetensors_bf16_widens(self, tmp_path):
        import json
        import struct

        vals = np.array([1.5, -2.0, 0.015625, 3.0], np.float32)
        bf16 = (vals.view(np.uint32) >> 16).astype(np.uint16)
        header = {
            "x": {"dtype": "BF16", "shape": [4],
                  "data_offsets": [0, 8]},
        }
        hj = json.dumps(header).encode()
        path = tmp_path / "b.safetensors"
        path.write_bytes(struct.pack("<Q", len(hj)) + hj + bf16.tobytes())
        out = pt.load_safetensors(path)
        np.testing.assert_array_equal(out["x"], vals)  # exact bf16 values

    def test_torch_pth_roundtrip(self, tmp_path):
        spec = get_model("resnet_tiny")
        model = spec.build(num_classes=4)
        variables = _np_variables(model.init(jax.random.PRNGKey(12)))
        flat = _export_resnet(model, variables)
        sd = {k: torch.tensor(v) for k, v in flat.items()}
        path = tmp_path / "r.pth"
        torch.save(sd, path)
        _, loaded = pt.load_pretrained("resnet_tiny", path)
        _tree_allclose(variables, _np_variables(loaded))

    def test_garbage_safetensors_is_loud(self, tmp_path):
        path = tmp_path / "x.safetensors"
        path.write_bytes(b"\x00")
        with pytest.raises(pt.PretrainedFormatError):
            pt.load_safetensors(path)


class TestPosEmbedInterpolation:
    def test_grid_resize(self):
        # a 196-patch (224px) checkpoint into the 576-patch (384px) model
        dim = 8
        pos = np.random.default_rng(0).standard_normal(
            (1, 197, dim)
        ).astype(np.float32)
        out = pt._resize_pos_embed(pos, 576, dim)
        assert out.shape == (1, 577, dim)
        np.testing.assert_allclose(out[:, 0], pos[:, 0])  # cls kept

    def test_bad_grid_is_loud(self):
        with pytest.raises(pt.PretrainedFormatError):
            pt._resize_pos_embed(np.zeros((1, 11, 4), np.float32), 576, 4)


class TestJobWiring:
    def test_resolve_pretrained(self, tmp_path):
        from ics_tpu.train.job import TrainingJobManager

        mgr = TrainingJobManager.__new__(TrainingJobManager)
        mgr.checkpoint_root = tmp_path
        (tmp_path / "pretrained").mkdir()
        (tmp_path / "pretrained" / "r50.npz").write_bytes(b"x")
        assert mgr.resolve_pretrained("r50.npz").name == "r50.npz"
        absolute = tmp_path / "abs.npz"
        absolute.write_bytes(b"x")
        assert mgr.resolve_pretrained(str(absolute)) == absolute
        with pytest.raises(FileNotFoundError, match="não encontrados"):
            mgr.resolve_pretrained("missing.npz")


class TestContainerHardening:
    """review r4: real-world container variants the loader used to crash
    on with raw TypeError/AttributeError/ValueError instead of loading or
    raising PretrainedFormatError."""

    def test_pt_bf16_widens(self, tmp_path):
        import torch

        spec = get_model("resnet_tiny")
        model = spec.build(num_classes=4)
        variables = _np_variables(model.init(jax.random.PRNGKey(21)))
        flat = _export_resnet(model, variables)
        sd = {k: torch.from_numpy(np.ascontiguousarray(v)).bfloat16()
              for k, v in flat.items()}
        path = tmp_path / "bf16.pth"
        torch.save(sd, path)
        out = pt.load_flat(path)
        # widened to f32 with bf16 precision (not a crash)
        assert out["fc.weight"].dtype == np.float32
        np.testing.assert_allclose(
            out["fc.weight"], flat["fc.weight"], rtol=1e-2, atol=1e-2
        )

    def test_pt_model_wrapper_with_metadata(self, tmp_path):
        import torch

        spec = get_model("resnet_tiny")
        model = spec.build(num_classes=4)
        variables = _np_variables(model.init(jax.random.PRNGKey(22)))
        flat = _export_resnet(model, variables)
        sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in flat.items()}
        path = tmp_path / "wrapped.pth"
        torch.save({"model": sd, "epoch": 12}, path)
        _, loaded = pt.load_pretrained("resnet_tiny", path)
        _tree_allclose(variables, _np_variables(loaded))

    def test_pt_non_state_dict_rejected(self, tmp_path):
        import torch

        path = tmp_path / "junk.pth"
        torch.save([1, 2, 3], path)
        with pytest.raises(pt.PretrainedFormatError, match="state_dict"):
            pt.load_flat(path)

    def test_safetensors_truncated_data_rejected(self, tmp_path):
        import json
        import struct

        header = {
            "x": {"dtype": "F32", "shape": [64],
                  "data_offsets": [0, 256]},
        }
        hj = json.dumps(header).encode()
        path = tmp_path / "trunc.safetensors"
        # only 16 of the promised 256 data bytes
        path.write_bytes(struct.pack("<Q", len(hj)) + hj + b"\x00" * 16)
        with pytest.raises(pt.PretrainedFormatError):
            pt.load_safetensors(path)

    def test_safetensors_list_header_rejected(self, tmp_path):
        import json
        import struct

        hj = json.dumps([1, 2]).encode()
        path = tmp_path / "list.safetensors"
        path.write_bytes(struct.pack("<Q", len(hj)) + hj)
        with pytest.raises(pt.PretrainedFormatError):
            pt.load_safetensors(path)

    def test_safetensors_bad_size_for_shape_rejected(self, tmp_path):
        import json
        import struct

        # 10 bytes for an F32[4] (needs 16): frombuffer/reshape must
        # surface as PretrainedFormatError, not raw ValueError
        header = {
            "x": {"dtype": "F32", "shape": [4], "data_offsets": [0, 10]},
        }
        hj = json.dumps(header).encode()
        path = tmp_path / "badsize.safetensors"
        path.write_bytes(struct.pack("<Q", len(hj)) + hj + b"\x00" * 10)
        with pytest.raises(pt.PretrainedFormatError):
            pt.load_safetensors(path)
