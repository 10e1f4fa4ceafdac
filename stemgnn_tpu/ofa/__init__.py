from stemgnn_tpu.ofa.subgraph import sample_fixed_hop_neighbors, induced_edges  # noqa: F401
from stemgnn_tpu.ofa.prompt import build_prompted_graph, collate_prompted  # noqa: F401
from stemgnn_tpu.ofa.datasets import (  # noqa: F401
    SubgraphNodeDataset, SubgraphLinkHierDataset, SubgraphKGHierDataset,
    GraphListHierDataset,
)
from stemgnn_tpu.ofa.fewshot import SimpleFSManager, FewShotDataset  # noqa: F401
from stemgnn_tpu.ofa.multi import MultiDataset  # noqa: F401
