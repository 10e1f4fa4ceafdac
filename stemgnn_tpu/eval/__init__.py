from stemgnn_tpu.eval.buckets import (  # noqa: F401
    compute_degree_buckets,
    compute_homophily_buckets,
    compute_alignment_buckets,
    stratified_split,
)
from stemgnn_tpu.eval.perturb import (  # noqa: F401
    apply_missing_features,
    apply_random_edge_drops,
)
