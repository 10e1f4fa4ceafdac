"""Processed-dataset caching and reference-cache import.

Re-design of the ``OFAPygDataset`` cache layer (reference
STEM-GNN/dataset/data/ofa_data.py:31-121: process-once ->
``geometric_data_processed.pt`` -> load): here datasets round-trip through
``.npz`` caches keyed by (name, text encoder, dim), and existing reference
caches (PyG ``collate``d Data saved by torch) can be imported into
:class:`TAGDataset` when available.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional

import numpy as np

from stemgnn_tpu.data.dataset import TAGDataset

DEFAULT_CACHE_ROOT = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), "data_cache")


def cache_path(name: str, encoder: str, dim: int,
               root: Optional[str] = None) -> str:
    root = root or DEFAULT_CACHE_ROOT
    return osp.join(root, f"{name}__{encoder}__{dim}.npz")


def save_dataset_cache(ds: TAGDataset, encoder: str = "hash",
                       root: Optional[str] = None) -> str:
    path = cache_path(ds.name, encoder, ds.node_text_feat.shape[1], root)
    os.makedirs(osp.dirname(path), exist_ok=True)
    payload = {
        "node_text_feat": ds.node_text_feat,
        "edge_text_feat": ds.edge_text_feat,
        "x": ds.x, "xe": ds.xe, "edge_index": ds.edge_index,
        "num_classes": np.asarray(ds.num_classes),
        "num_tasks": np.asarray(ds.num_tasks),
    }
    if ds.labels is not None:
        payload["labels"] = np.asarray(ds.labels)
    if ds.class_node_text_feat is not None:
        payload["class_node_text_feat"] = ds.class_node_text_feat
    if ds.splits:
        for i, split in enumerate(ds.splits):
            for k, v in split.items():
                payload[f"split{i}_{k}"] = v
        payload["num_splits"] = np.asarray(len(ds.splits))
    if ds.extras:
        try:
            import json
            payload["extras_json"] = np.asarray(json.dumps(ds.extras))
        except TypeError:
            pass            # non-JSON extras (arrays etc.) are not cached
    np.savez_compressed(path + ".tmp.npz", **payload)
    os.replace(path + ".tmp.npz", path)
    return path


def load_dataset_cache(name: str, encoder: str = "hash", dim: int = 768,
                       root: Optional[str] = None) -> Optional[TAGDataset]:
    path = cache_path(name, encoder, dim, root)
    if not osp.exists(path):
        return None
    z = np.load(path)
    splits = None
    if "num_splits" in z:
        splits = []
        for i in range(int(z["num_splits"])):
            splits.append({k: z[f"split{i}_{k}"]
                           for k in ("train", "valid", "test")})
    return TAGDataset(
        name=name,
        node_text_feat=z["node_text_feat"],
        edge_text_feat=z["edge_text_feat"],
        x=z["x"], xe=z["xe"], edge_index=z["edge_index"],
        labels=z["labels"] if "labels" in z else None,
        splits=splits,
        class_node_text_feat=(z["class_node_text_feat"]
                              if "class_node_text_feat" in z else None),
        num_classes=int(z["num_classes"]), num_tasks=int(z["num_tasks"]),
        extras=(__import__("json").loads(str(z["extras_json"]))
                if "extras_json" in z else {}))


def import_reference_cache(pt_path: str, name: str) -> TAGDataset:
    """Import a reference ``geometric_data_processed.pt`` cache (torch-saved
    PyG collated Data, reference data/ofa_data.py:113-121) into a TAGDataset.

    Requires torch; works with plain dict-like payloads — the saved object is
    ``(data, slices)`` from InMemoryDataset.collate.
    """
    import torch
    payload = torch.load(pt_path, map_location="cpu", weights_only=False)
    data = payload[0] if isinstance(payload, (tuple, list)) else payload

    def get(key, default=None):
        v = getattr(data, key, None)
        if v is None and hasattr(data, "get"):
            v = data.get(key, default)
        return None if v is None else np.asarray(v)

    node_text_feat = get("node_text_feat")
    edge_text_feat = get("edge_text_feat")
    edge_index = get("edge_index")
    if node_text_feat is None or edge_index is None:
        raise ValueError(f"{pt_path} lacks node_text_feat/edge_index")
    x = get("x")
    if x is None or x.ndim > 1:
        x = np.arange(node_text_feat.shape[0])
    xe = get("xe")
    if xe is None:
        xe = np.zeros(edge_index.shape[1], np.int64)
    labels = get("y")
    return TAGDataset(
        name=name, node_text_feat=node_text_feat.astype(np.float32),
        edge_text_feat=(edge_text_feat.astype(np.float32)
                        if edge_text_feat is not None
                        else np.zeros((1, node_text_feat.shape[1]),
                                      np.float32)),
        x=x.astype(np.int64), xe=xe.astype(np.int64),
        edge_index=edge_index.astype(np.int64), labels=labels,
        class_node_text_feat=get("class_node_text_feat"),
        num_classes=int(labels.max()) + 1 if labels is not None and
        labels.size else 0)


# -------------------------------------------------- memmap ("ST") cache

def st_cache_path(name: str, encoder: str, dim: int,
                  root: Optional[str] = None) -> str:
    """Directory cache for huge datasets (the reference's memmap variant,
    ``OFAPygSTDataset``, data/ofa_data.py:165-222)."""
    root = root or DEFAULT_CACHE_ROOT
    return osp.join(root, f"{name}__{encoder}__{dim}.st")


def save_dataset_cache_memmap(ds: TAGDataset, encoder: str = "hash",
                              root: Optional[str] = None) -> str:
    """Save with the large feature tables as raw ``.npy`` (memmap-loadable);
    everything else in one small ``meta.npz``."""
    base = st_cache_path(ds.name, encoder, ds.node_text_feat.shape[1], root)
    os.makedirs(base, exist_ok=True)
    big = {"node_text_feat": ds.node_text_feat,
           "edge_text_feat": ds.edge_text_feat}
    if ds.class_node_text_feat is not None:
        big["class_node_text_feat"] = ds.class_node_text_feat
    for k, v in big.items():
        np.save(osp.join(base, f"{k}.npy"), np.ascontiguousarray(v))
    meta = {"x": ds.x, "xe": ds.xe, "edge_index": ds.edge_index,
            "num_classes": np.asarray(ds.num_classes),
            "num_tasks": np.asarray(ds.num_tasks)}
    if ds.labels is not None:
        meta["labels"] = np.asarray(ds.labels)
    if ds.splits:
        for i, split in enumerate(ds.splits):
            for k, v in split.items():
                meta[f"split{i}_{k}"] = v
        meta["num_splits"] = np.asarray(len(ds.splits))
    np.savez_compressed(osp.join(base, "meta.npz"), **meta)
    return base


def load_dataset_cache_memmap(name: str, encoder: str = "hash",
                              dim: int = 768,
                              root: Optional[str] = None,
                              ) -> Optional[TAGDataset]:
    """Load an ``.st`` directory cache with the feature tables memory-mapped
    (read-only): host RAM stays O(edges), not O(nodes x dim) — samplers and
    device uploads read rows on demand (reference OFAPygSTDataset semantics,
    data/ofa_data.py:165-222)."""
    base = st_cache_path(name, encoder, dim, root)
    meta_path = osp.join(base, "meta.npz")
    if not osp.exists(meta_path):
        return None
    z = np.load(meta_path)
    mm = lambda k: np.load(osp.join(base, f"{k}.npy"), mmap_mode="r")
    splits = None
    if "num_splits" in z:
        splits = [{k: z[f"split{i}_{k}"] for k in ("train", "valid", "test")}
                  for i in range(int(z["num_splits"]))]
    cls_path = osp.join(base, "class_node_text_feat.npy")
    return TAGDataset(
        name=name,
        node_text_feat=mm("node_text_feat"),
        edge_text_feat=mm("edge_text_feat"),
        x=z["x"], xe=z["xe"], edge_index=z["edge_index"],
        labels=z["labels"] if "labels" in z else None,
        splits=splits,
        class_node_text_feat=(mm("class_node_text_feat")
                              if osp.exists(cls_path) else None),
        num_classes=int(z["num_classes"]), num_tasks=int(z["num_tasks"]))
