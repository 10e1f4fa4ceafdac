"""OOD bucket computation + stratified splitting (host-side numpy).

Re-designs of the reference eval scripts' bucketing:

  * degree buckets    — sort by undirected degree; bottom/top 15% = OOD-low /
                        OOD-high, middle = ID (scripts/degree_shift_ood.py:37-72),
  * homophily buckets — per-node mean cosine similarity of features to
                        neighbors over the undirected, self-loop-free graph;
                        15/85 cut (scripts/homophily_shift_ood.py:95-175),
  * alignment buckets — same statistic, 4 buckets: OOD3 = bottom 10%,
                        OOD2 = 10-20%, OOD1 = 20-30%, ID = 30-80%
                        (scripts/tri_objective.py:260-340),
  * stratified_split  — 50/25/25 per class within ID with the reference's
                        overflow-reduction rules (degree_shift_ood.py:75-126).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

PRIMARY_RATIOS = (0.5, 0.25)
SECONDARY_RATIOS = (0.4, 0.3)


def _undirected_no_selfloop(edge_index: np.ndarray) -> np.ndarray:
    src = np.concatenate([edge_index[0], edge_index[1]])
    dst = np.concatenate([edge_index[1], edge_index[0]])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src.astype(np.int64) * (max(int(dst.max(initial=0)), int(src.max(initial=0))) + 1) + dst
    _, uniq = np.unique(key, return_index=True)
    return np.stack([src[uniq], dst[uniq]])


def _undirected(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    src = np.concatenate([edge_index[0], edge_index[1]])
    dst = np.concatenate([edge_index[1], edge_index[0]])
    key = src.astype(np.int64) * num_nodes + dst
    _, uniq = np.unique(key, return_index=True)
    return np.stack([src[uniq], dst[uniq]])


def _shrink_counts(n: int, low: int, high: int) -> Tuple[int, int]:
    """The reference's overflow-reduction dance (degree_shift_ood.py:44-57)."""
    if low + high >= n:
        overflow = low + high - (n - 1)
        red = min(overflow, max(0, high - 1))
        high -= red
        overflow -= red
        if overflow > 0:
            red = min(overflow, max(0, low - 1))
            low -= red
    return low, high


def compute_degree_buckets(edge_index: np.ndarray, num_nodes: int):
    """Returns (deg, (low_boundary, high_boundary), bucket_indices)."""
    und = _undirected(edge_index, num_nodes)
    deg = np.bincount(und[0], minlength=num_nodes).astype(np.float32)
    sorted_idx = np.argsort(deg, kind="stable")
    low = max(1, int(math.floor(num_nodes * 0.15)))
    high = max(1, int(math.floor(num_nodes * 0.15)))
    low, high = _shrink_counts(num_nodes, low, high)
    id_count = num_nodes - low - high
    buckets = {
        "OOD-low": sorted_idx[:low],
        "ID": sorted_idx[low:low + id_count],
        "OOD-high": sorted_idx[low + id_count:],
    }
    bounds = (float(deg[buckets["OOD-low"][-1]]),
              float(deg[buckets["OOD-high"][0]]))
    return deg, bounds, buckets


def _neighbor_feature_similarity(x: np.ndarray, edge_index: np.ndarray,
                                 num_nodes: int):
    """Per-node mean cosine similarity to neighbors (homophily / alignment
    statistic, homophily_shift_ood.py:107-131)."""
    if x.ndim == 1:
        x = x[:, None]
    finite = np.isfinite(x).all(axis=1)
    norm = np.linalg.norm(x, axis=1)
    valid_feat = finite & (norm > 0)
    x_norm = x / np.clip(norm, 1e-12, None)[:, None]

    und = _undirected(edge_index, num_nodes)
    keep = und[0] != und[1]
    row, col = und[0][keep], und[1][keep]
    ve = valid_feat[row] & valid_feat[col]
    row, col = row[ve], col[ve]
    sim = np.sum(x_norm[row] * x_norm[col], axis=1)

    denom = np.zeros(num_nodes, np.float32)
    numer = np.zeros(num_nodes, np.float32)
    np.add.at(denom, row, 1.0)
    np.add.at(numer, row, sim)
    stat = np.zeros(num_nodes, np.float32)
    nz = denom > 0
    stat[nz] = numer[nz] / denom[nz]
    valid_nodes = np.nonzero(nz & valid_feat)[0]
    return stat, valid_nodes, int((~nz).sum()), int((~valid_feat).sum())


def compute_homophily_buckets(x: np.ndarray, edge_index: np.ndarray,
                              num_nodes: int):
    """15/85 buckets over valid nodes (homophily_shift_ood.py:95-175)."""
    stat, valid_nodes, no_nbrs, invalid = _neighbor_feature_similarity(
        x, edge_index, num_nodes)
    if valid_nodes.size < 3:
        raise ValueError("valid_nodes too small for 3-way split")
    sorted_idx = valid_nodes[np.argsort(stat[valid_nodes], kind="stable")]
    n = sorted_idx.size
    low = max(1, int(math.floor(n * 0.15)))
    high = max(1, int(math.floor(n * 0.15)))
    low, high = _shrink_counts(n, low, high)
    id_count = n - low - high
    buckets = {
        "OOD-low": sorted_idx[:low],
        "ID": sorted_idx[low:low + id_count],
        "OOD-high": sorted_idx[low + id_count:],
    }
    bounds = (float(stat[buckets["OOD-low"][-1]]),
              float(stat[buckets["OOD-high"][0]]))
    return stat, bounds, buckets, no_nbrs, invalid


def compute_alignment_buckets(x: np.ndarray, edge_index: np.ndarray,
                              num_nodes: int):
    """4 buckets by feature-structure alignment (tri_objective.py:260-340)."""
    stat, valid_nodes, no_nbrs, invalid = _neighbor_feature_similarity(
        x, edge_index, num_nodes)
    if valid_nodes.size < 10:
        raise ValueError("valid_nodes too small for 4-way split")
    sorted_idx = valid_nodes[np.argsort(stat[valid_nodes], kind="stable")]
    n = sorted_idx.size
    c3 = max(1, int(math.floor(n * 0.10)))
    c2 = max(c3 + 1, int(math.floor(n * 0.20)))
    c1 = max(c2 + 1, int(math.floor(n * 0.30)))
    id_lo = max(c1, int(math.floor(n * 0.30)))
    id_hi = min(max(id_lo + 1, int(math.floor(n * 0.80))), n)
    if id_lo >= id_hi:
        raise ValueError("valid_nodes too small for ID split (30%-80%).")
    buckets = {
        "OOD3": sorted_idx[:c3],
        "OOD2": sorted_idx[c3:c2],
        "OOD1": sorted_idx[c2:c1],
        "ID": sorted_idx[id_lo:id_hi],
    }
    bounds = (float(stat[buckets["OOD3"][-1]]),
              float(stat[buckets["OOD2"][-1]]),
              float(stat[buckets["OOD1"][-1]]),
              float(stat[buckets["ID"][0]]),
              float(stat[buckets["ID"][-1]]))
    return stat, bounds, buckets, no_nbrs, invalid


def determine_split_counts(class_size: int) -> Tuple[int, int]:
    """degree_shift_ood.py:75-100."""
    if class_size < 3:
        raise RuntimeError(f"class size {class_size} too small for 3-way split")
    for ratios in (PRIMARY_RATIOS, SECONDARY_RATIOS):
        train = max(1, math.floor(class_size * ratios[0]))
        val = max(1, math.floor(class_size * ratios[1]))
        if train + val >= class_size:
            overflow = train + val - (class_size - 1)
            red = min(overflow, max(0, val - 1))
            val -= red
            overflow -= red
            if overflow > 0:
                red = min(overflow, max(0, train - 1))
                train -= red
        test = class_size - train - val
        if train >= 1 and val >= 1 and test >= 1:
            return train, val
    return max(1, class_size - 2), 1


def stratified_split(id_indices: np.ndarray, labels: np.ndarray, seed: int):
    """Per-class 50/25/25 split inside the ID bucket
    (degree_shift_ood.py:103-126)."""
    rng = np.random.default_rng(seed)
    id_labels = labels[id_indices]
    train_p, val_p, test_p = [], [], []
    for cls in np.unique(id_labels):
        cls_idx = id_indices[id_labels == cls]
        tr, va = determine_split_counts(cls_idx.size)
        perm = rng.permutation(cls_idx.size)
        cls_idx = cls_idx[perm]
        train_p.append(cls_idx[:tr])
        val_p.append(cls_idx[tr:tr + va])
        test_p.append(cls_idx[tr + va:])
    return (np.sort(np.concatenate(train_p)),
            np.sort(np.concatenate(val_p)),
            np.sort(np.concatenate(test_p)))
