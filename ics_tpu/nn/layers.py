"""Functional NN layer library (pure JAX, no flax dependency).

Design: each layer is a small config object with ``init(key) -> params``
(a pytree of jnp arrays) and ``apply(params, x, ...) -> y``. Models compose
layers explicitly and their parameters are plain nested dicts — trivially
shardable with ``jax.sharding`` and checkpointable with orbax.

Layout conventions (TPU-first):
- activations NHWC (channels-last; XLA's preferred conv layout on TPU)
- conv kernels HWIO
- compute dtype configurable (bf16 for inference; params can stay fp32)
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax


def _fan_in_out(shape: Sequence[int]) -> tuple[int, int]:
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = math.prod(shape[:-2])
    return shape[-2] * receptive, shape[-1] * receptive


def kaiming_normal(key, shape, dtype=jnp.float32):
    fan_in, _ = _fan_in_out(shape)
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = _fan_in_out(shape)
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def truncated_normal(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * jnp.asarray(
        std, dtype
    )


class Conv2D:
    """2-D convolution, NHWC x HWIO -> NHWC."""

    def __init__(
        self,
        in_ch: int,
        out_ch: int,
        kernel: int | tuple[int, int] = 3,
        stride: int | tuple[int, int] = 1,
        padding: str | int = "SAME",
        groups: int = 1,
        use_bias: bool = False,
    ):
        self.in_ch = in_ch
        self.out_ch = out_ch
        self.kernel = (kernel, kernel) if isinstance(kernel, int) else tuple(kernel)
        self.stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
        if isinstance(padding, int):
            self.padding = [(padding, padding), (padding, padding)]
        else:
            self.padding = padding
        self.groups = groups
        self.use_bias = use_bias

    def init(self, key) -> dict:
        kh, kw = self.kernel
        w = kaiming_normal(key, (kh, kw, self.in_ch // self.groups, self.out_ch))
        params = {"w": w}
        if self.use_bias:
            params["b"] = jnp.zeros((self.out_ch,), jnp.float32)
        return params

    def apply(self, params, x):
        # no explicit preferred_element_type: XLA accumulates bf16 convs in
        # fp32 on TPU by default, and an explicit f32 output + downcast
        # breaks the conv transpose (VJP) with mixed dtypes
        w = params["w"].astype(x.dtype)
        y = lax.conv_general_dilated(
            x,
            w,
            window_strides=self.stride,
            padding=self.padding,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + params["b"].astype(x.dtype)
        return y


class Dense:
    def __init__(self, in_dim: int, out_dim: int, use_bias: bool = True,
                 init: str = "xavier"):
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.use_bias = use_bias
        self.init_kind = init

    def init(self, key) -> dict:
        if self.init_kind == "trunc_normal":
            w = truncated_normal(key, (self.in_dim, self.out_dim))
        elif self.init_kind == "kaiming":
            w = kaiming_normal(key, (self.in_dim, self.out_dim))
        else:
            w = xavier_uniform(key, (self.in_dim, self.out_dim))
        params = {"w": w}
        if self.use_bias:
            params["b"] = jnp.zeros((self.out_dim,), jnp.float32)
        return params

    def apply(self, params, x):
        y = jnp.dot(x, params["w"].astype(x.dtype))
        if self.use_bias:
            y = y + params["b"].astype(x.dtype)
        return y


class BatchNorm:
    """BatchNorm with running statistics.

    ``apply(params, state, x, training)`` returns ``(y, new_state)``.
    For inference-only graphs use :func:`fold_batchnorm` to pre-fold into a
    scale+bias pair (one fused multiply-add, HBM-bandwidth friendly).
    """

    def __init__(self, num_features: int, eps: float = 1e-5, momentum: float = 0.9):
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum

    def init(self, key=None) -> dict:
        n = self.num_features
        return {"gamma": jnp.ones((n,), jnp.float32), "beta": jnp.zeros((n,), jnp.float32)}

    def init_state(self) -> dict:
        n = self.num_features
        return {"mean": jnp.zeros((n,), jnp.float32), "var": jnp.ones((n,), jnp.float32)}

    def apply(self, params, state, x, training: bool = False):
        if training:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x.astype(jnp.float32), axis=axes)
            var = jnp.var(x.astype(jnp.float32), axis=axes)
            new_state = {
                "mean": self.momentum * state["mean"] + (1 - self.momentum) * mean,
                "var": self.momentum * state["var"] + (1 - self.momentum) * var,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        scale = params["gamma"] * lax.rsqrt(var + self.eps)
        bias = params["beta"] - mean * scale
        y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
        return y, new_state


def fold_batchnorm(params: dict, state: dict, eps: float = 1e-5) -> dict:
    """Pre-fold BN(gamma,beta,mean,var) into (scale, bias) for inference."""
    scale = params["gamma"] * jax.lax.rsqrt(state["var"] + eps)
    bias = params["beta"] - state["mean"] * scale
    return {"scale": scale, "bias": bias}


class LayerNorm:
    def __init__(self, dim: int, eps: float = 1e-6):
        self.dim = dim
        self.eps = eps

    def init(self, key=None) -> dict:
        return {"gamma": jnp.ones((self.dim,), jnp.float32),
                "beta": jnp.zeros((self.dim,), jnp.float32)}

    def apply(self, params, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * lax.rsqrt(var + self.eps)
        y = y * params["gamma"] + params["beta"]
        return y.astype(x.dtype)


def max_pool(x, window: int = 3, stride: int = 2,
             padding: str | int = "SAME"):
    # int padding = symmetric spatial padding (the torch MaxPool2d
    # convention; -inf fill matches torch's implicit padding semantics)
    if isinstance(padding, int):
        padding = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        padding,
    )


def avg_pool(x, window: int = 2, stride: int = 2):
    """Non-padded average pooling (the torch AvgPool2d(k, s) convention
    used by DenseNet transitions — count includes the full window)."""
    y = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return (y / float(window * window)).astype(x.dtype)


def gelu(x, exact: bool = True):
    """GELU whose exactness follows the compute dtype.

    torch/timm checkpoints are trained with exact (erf) GELU, but on v5e
    erf costs 22-46% whole-model throughput (ViT-B/ConvNeXt-T, measured,
    docs/benchmarks.md r3) — and under half precision the tanh
    approximation's ~3e-4 error is BELOW rounding noise: bf16+approx
    deviates from the fp32+exact reference no more than bf16+exact does
    (measured max|Δlogit| 0.0095 vs 0.0106, top-1 agreement 1.000). So:
    exact erf under fp32 (training/parity/import verification), tanh
    approximation under bf16/f16 (the serving path). ``exact=False``
    forces the approximation regardless of dtype (the from-scratch d=128
    ViT variants, which have no imported weights to stay faithful to).
    """
    approximate = (not exact) or x.dtype in (jnp.bfloat16, jnp.float16)
    return jax.nn.gelu(x, approximate=approximate)


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2))


def hard_sigmoid(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def hard_swish(x):
    return x * hard_sigmoid(x)
