from stemgnn_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
)
from stemgnn_tpu.ops.spmm import sage_aggregate, gather_scatter_aggregate  # noqa: F401
from stemgnn_tpu.ops.sddmm import edge_inner_product  # noqa: F401
