from stemgnn_tpu.zoo.convs_rel import (  # noqa: F401
    rgcn_edge_init, rgcn_edge_apply, rgat_edge_init, rgat_edge_apply,
)
from stemgnn_tpu.zoo.stack import gnn_stack_init, gnn_stack_apply  # noqa: F401
from stemgnn_tpu.zoo.mlp import mlp_init, mlp_apply  # noqa: F401
from stemgnn_tpu.zoo.losses import info_nce_loss, cca_loss, mrr  # noqa: F401
from stemgnn_tpu.zoo.resolver import resolve_activation  # noqa: F401
