from stemgnn_tpu.data.dataset import TAGDataset  # noqa: F401
from stemgnn_tpu.data.synthetic import (  # noqa: F401
    synthetic_node_dataset, synthetic_link_dataset, synthetic_graph_dataset,
    random_power_law_graph,
)
