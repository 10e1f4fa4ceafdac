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


class _PygStub:
    """Shape-agnostic stand-in for any pickled torch_geometric class: state
    lands in ``__dict__`` (PyG's BaseStorage/Data pickle protocol is
    ``__getstate__ -> dict``), construction args are ignored."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


def _install_pyg_stub_modules():
    """Register stub ``torch_geometric`` modules so reference caches
    (pickled PyG ``Data`` objects) unpickle WITHOUT torch_geometric
    installed — pickle resolves classes by (module, name) string, and the
    stubs absorb any class from the package.  No-op when real PyG exists."""
    import sys
    import types
    existing = sys.modules.get("torch_geometric")
    if existing is not None and not getattr(existing, "__pyg_stub__", False):
        return   # real torch_geometric present
    try:
        import torch_geometric  # noqa: F401  (import outside sys.modules)
        return
    except ImportError:
        pass

    def make_mod(modname):
        m = types.ModuleType(modname)
        m.__pyg_stub__ = True

        def ga(attr, _mod=modname):
            cls = type(attr, (_PygStub,), {"__module__": _mod})
            setattr(m, attr, cls)
            return cls
        m.__getattr__ = ga
        return m

    for modname in ("torch_geometric", "torch_geometric.data",
                    "torch_geometric.data.data",
                    "torch_geometric.data.storage",
                    "torch_geometric.data.in_memory_dataset"):
        if modname not in sys.modules:
            sys.modules[modname] = make_mod(modname)


def import_reference_cache(pt_path: str, name: str) -> TAGDataset:
    """Import a reference ``geometric_data_processed.pt`` cache (torch-saved
    PyG collated Data, reference data/ofa_data.py:113-121) into a TAGDataset.

    Requires torch only: when torch_geometric is absent, stub modules absorb
    the pickled PyG classes (Data holds a ``_store`` GlobalStorage whose
    ``_mapping`` dict carries the tensors — PyG 2.3 pickle layout), so the
    import works in environments where PyG cannot be installed.
    """
    import torch
    _install_pyg_stub_modules()
    payload = torch.load(pt_path, map_location="cpu", weights_only=False)
    data = payload[0] if isinstance(payload, (tuple, list)) else payload

    def _mapping_of(obj):
        # PyG Data: attributes live in obj._store._mapping (GlobalStorage);
        # plain dicts / namespaces work too
        d = getattr(obj, "__dict__", {})
        store = d.get("_store")
        if store is not None:
            sd = getattr(store, "__dict__", {})
            return sd.get("_mapping", sd)
        return d.get("_mapping", d) if d else (
            obj if isinstance(obj, dict) else {})

    mapping = _mapping_of(data)

    def get(key, default=None):
        v = getattr(data, key, None) if not isinstance(data, dict) else None
        if not _is_tensorlike(v):
            v = mapping.get(key, default)
        if v is None or not _is_tensorlike(v):
            return None
        return np.asarray(v)

    def _is_tensorlike(v):
        return v is not None and (hasattr(v, "numpy") or
                                  isinstance(v, np.ndarray))

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
