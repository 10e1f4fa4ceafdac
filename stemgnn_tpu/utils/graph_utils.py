"""Graph manipulation utilities (reference STEM-GNN/utils/others.py).

  * ``flip_edges``       — randomly flip adjacency entries (others.py:107-127;
    the reference densifies the adjacency and loops in Python — redone
    sparsely with set arithmetic),
  * ``active_code``      — codebook-usage probe (others.py:152-157),
  * ``mask2idx``/``idx2mask`` (others.py:180-187).
"""

from __future__ import annotations

import numpy as np


def flip_edges(edge_index: np.ndarray, num_nodes: int, p: float = 0.2,
               seed: int = 0):
    """Flip ~p*E undirected adjacency entries (present<->absent)."""
    rng = np.random.default_rng(seed)
    e = edge_index.shape[1]
    und = {(min(a, b), max(a, b)) for a, b in edge_index.T.tolist()}
    is_und = all((b, a) in und or (a, b) in und
                 for a, b in edge_index.T.tolist()[:100])
    n_flip = int(e * p / 2) if is_und else int(e * p)
    pairs = rng.integers(0, num_nodes, size=(n_flip, 2))
    for a, b in pairs:
        key = (min(int(a), int(b)), max(int(a), int(b)))
        if key in und:
            und.discard(key)
        else:
            und.add(key)
    src = np.asarray([k[0] for k in und] + [k[1] for k in und])
    dst = np.asarray([k[1] for k in und] + [k[0] for k in und])
    return np.stack([src, dst])


def active_code(encoder_params, encoder_state, enc_cfg, vq_params, vq_state,
                vq_cfg, graph):
    """Fraction of codebook entries used on a graph (others.py:152-157).
    Returns (unique_indices, active_fraction)."""
    import jax
    import numpy as np

    from stemgnn_tpu.nn.encoder import encoder_apply
    from stemgnn_tpu.vq import vq_apply

    z, _, _ = encoder_apply(encoder_params, encoder_state, enc_cfg,
                            graph.node_feat, graph.senders, graph.receivers,
                            edge_feat=graph.edge_feat,
                            edge_mask=graph.edge_mask,
                            node_mask=graph.node_mask, training=False)
    res = vq_apply(vq_params, vq_state, vq_cfg, z, training=False)
    idx = np.asarray(res["indices"])[np.asarray(graph.node_mask)]
    uniq = np.unique(idx)
    return uniq, uniq.size / (vq_cfg.codebook_size * vq_cfg.heads)


def mask2idx(mask: np.ndarray) -> np.ndarray:
    return np.nonzero(np.asarray(mask))[0]


def idx2mask(idx, num_nodes: int) -> np.ndarray:
    m = np.zeros(num_nodes, bool)
    m[np.asarray(idx)] = True
    return m
