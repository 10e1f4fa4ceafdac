from stemgnn_tpu.core.graph import (  # noqa: F401
    Graph,
    pad_graph,
    sort_edges_by_receiver,
    compute_in_degree,
    batch_graphs,
    pad_to_multiple,
    round_up,
)
