from stemgnn_tpu.nn import init, layers  # noqa: F401
from stemgnn_tpu.nn.layers import (  # noqa: F401
    linear_init, linear_apply,
    batchnorm_init, batchnorm_apply,
    dropout,
)
