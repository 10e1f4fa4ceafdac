"""Reference-cache import rehearsal (VERDICT r1 item 9).

The reference caches processed datasets as torch-saved PyG objects
(``geometric_data_processed.pt`` = ``(Data, slices)`` from
InMemoryDataset.collate, STEM-GNN/dataset/data/ofa_data.py:107-121).  PyG is
not installable in this environment, so the importer must unpickle those
files through stub ``torch_geometric`` modules.  This test writes a cache
with the EXACT pickle layout of PyG 2.3 (classes registered under the real
module paths, ``Data.__dict__ -> _store: GlobalStorage -> _mapping`` with a
parent backref, per torch_geometric/data/{data,storage}.py) and round-trips
it through :func:`import_reference_cache` with the fake modules removed —
i.e. the day-one scenario of receiving a real Cora cache."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _register_fake_pyg():
    """Classes under the real PyG module paths with PyG 2.3's pickle
    protocol, so torch.save produces a byte-stream indistinguishable (in
    schema) from one written by real torch_geometric."""
    mods = {}
    for name in ("torch_geometric", "torch_geometric.data",
                 "torch_geometric.data.data",
                 "torch_geometric.data.storage"):
        mods[name] = types.ModuleType(name)

    class GlobalStorage:
        def __init__(self, mapping, parent=None):
            self._mapping = dict(mapping)
            self._parent = parent

        # PyG BaseStorage.__getstate__ dereferences the parent weakref so
        # the Data object itself lands in the stream (cyclic, memoized)
        def __getstate__(self):
            out = self.__dict__.copy()
            return out

    GlobalStorage.__module__ = "torch_geometric.data.storage"
    GlobalStorage.__qualname__ = "GlobalStorage"

    class Data:
        def __init__(self, **kwargs):
            self.__dict__["_store"] = GlobalStorage(kwargs, parent=self)

    Data.__module__ = "torch_geometric.data.data"
    Data.__qualname__ = "Data"

    mods["torch_geometric.data.storage"].GlobalStorage = GlobalStorage
    mods["torch_geometric.data.data"].Data = Data
    for k, v in mods.items():
        sys.modules[k] = v
    return Data, list(mods)


def _clear_pyg_modules():
    for k in list(sys.modules):
        if k.startswith("torch_geometric"):
            del sys.modules[k]


def test_reference_cache_round_trip(tmp_path):
    from stemgnn_tpu.data.importers import import_reference_cache

    Data, registered = _register_fake_pyg()
    try:
        n, e, t, d = 30, 80, 3, 16
        rng = np.random.default_rng(0)
        data = Data(
            x=torch.arange(n),
            xe=torch.tensor(rng.integers(0, t, e)),
            edge_index=torch.tensor(
                rng.integers(0, n, (2, e)).astype(np.int64)),
            node_text_feat=torch.tensor(
                rng.standard_normal((n, d)).astype(np.float32)),
            edge_text_feat=torch.tensor(
                rng.standard_normal((t, d)).astype(np.float32)),
            class_node_text_feat=torch.tensor(
                rng.standard_normal((4, d)).astype(np.float32)),
            y=torch.tensor(rng.integers(0, 4, n)),
        )
        slices = {"x": torch.tensor([0, n])}
        path = tmp_path / "geometric_data_processed.pt"
        torch.save((data, slices), str(path))
    finally:
        _clear_pyg_modules()

    # day-one scenario: unpickle WITHOUT torch_geometric importable
    with pytest.raises(ImportError):
        import torch_geometric  # noqa: F401
    ds = import_reference_cache(str(path), "cora_ref")
    _clear_pyg_modules()   # drop the importer's stubs again

    assert ds.num_nodes == n and ds.num_edges == e
    assert ds.node_text_feat.shape == (n, d)
    assert ds.edge_text_feat.shape == (t, d)
    assert ds.class_node_text_feat.shape == (4, d)
    assert ds.num_classes == 4
    assert ds.labels is not None and ds.labels.shape == (n,)
    # feature lookup path works end-to-end
    feats = ds.node_features()
    ef = ds.edge_features()
    assert feats.shape == (n, d) and ef.shape == (e, d)
    assert np.isfinite(feats).all() and np.isfinite(ef).all()


def test_reference_cache_minimal_payload(tmp_path):
    """Caches that predate xe / class features import with sane defaults."""
    from stemgnn_tpu.data.importers import import_reference_cache

    Data, _ = _register_fake_pyg()
    try:
        n, e, d = 10, 20, 8
        rng = np.random.default_rng(1)
        data = Data(
            edge_index=torch.tensor(
                rng.integers(0, n, (2, e)).astype(np.int64)),
            node_text_feat=torch.tensor(
                rng.standard_normal((n, d)).astype(np.float32)))
        path = tmp_path / "geometric_data_processed.pt"
        torch.save((data, None), str(path))
    finally:
        _clear_pyg_modules()
    ds = import_reference_cache(str(path), "minimal")
    _clear_pyg_modules()
    assert ds.num_nodes == n and ds.num_edges == e
    assert (ds.xe == 0).all()
    assert ds.edge_text_feat.shape == (1, d)
