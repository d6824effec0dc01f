from ics_tpu.nn.layers import (  # noqa: F401
    BatchNorm,
    Conv2D,
    Dense,
    LayerNorm,
    fold_batchnorm,
)
