"""Raw-corpus parsers (data/raw_parsers.py): synthetic files written in the
reference's raw formats must load through the parsers AND the registry with
no PyG cache present (round-2 VERDICT item 6)."""

import gzip
import json
import os

import numpy as np
import pytest


def _write_cora_tree(tmp_path, name="cora"):
    import torch
    n = 30
    rng = np.random.default_rng(0)
    ei = rng.integers(0, n, (2, 80))
    payload = {
        "raw_texts": [f"paper {i} about topic {i % 3}" for i in range(n)],
        "label_names": ["theory", "systems", "ml"],
        "y": torch.tensor(rng.integers(0, 3, n)),
        "edge_index": torch.tensor(ei),
    }
    torch.save(payload, tmp_path / f"{name}.pt")
    if name == "cora":
        # Real-file format: header row + quoted descriptions with embedded
        # commas and doubled quotes (pandas read_csv semantics,
        # Cora/gen_data.py:36-38)
        (tmp_path / "categories.csv").write_text(
            ',description\n'
            'theory,"about proofs, with ""rigor"""\n'
            "systems,about computers\nml,about data\n")
    else:
        (tmp_path / "categories.csv").write_text(
            "diabetes type 1\ndiabetes type 2\ndiabetes experimental\n")
    return n, ei


@pytest.mark.parametrize("name", ["cora", "pubmed"])
def test_citation_raw_parser(tmp_path, name):
    from stemgnn_tpu.data.raw_parsers import load_citation_raw
    n, ei = _write_cora_tree(tmp_path, name)
    ds = load_citation_raw(name, root=str(tmp_path), text_encoder="hash",
                           feat_dim=16, num_splits=3)
    assert ds.num_nodes == n and ds.num_classes == 3
    # networkx-equivalent dedup of directed pairs (Cora/gen_data.py:30-32)
    want_e = np.unique(np.stack([ei[0], ei[1]], 1), axis=0).shape[0]
    assert ds.num_edges == want_e
    assert len(ds.splits) == 3
    tr_n = 140 if name == "cora" else 60
    assert ds.splits[0]["train"].sum() == min(tr_n, n)
    assert ds.class_node_text_feat.shape[0] == 3
    assert ds.node_text_feat.shape == (n, 16)


def test_arxiv_raw_parser(tmp_path):
    from stemgnn_tpu.data.raw_parsers import load_arxiv_raw
    n = 20
    rng = np.random.default_rng(1)
    (tmp_path / "raw").mkdir()
    (tmp_path / "split" / "time").mkdir(parents=True)

    def gz(path, lines):
        with gzip.open(tmp_path / path, "wt") as f:
            f.write("\n".join(lines))

    gz("nodeidx2paperid.csv.gz",
       ["node idx,paper id"] + [f"{i},{1000 + i}" for i in range(n)])
    with open(tmp_path / "titleabs.tsv", "w") as f:
        for i in range(n):
            if i == 3:  # paper with an empty abstract ships as a 2-field row
                f.write(f"{1000 + i}\ttitle {i}\n")
            else:
                f.write(f"{1000 + i}\ttitle {i}\tabstract {i}\n")
    edges = rng.integers(0, n, (40, 2))
    gz("raw/edge.csv.gz", [f"{a},{b}" for a, b in edges])
    y = rng.integers(0, 2, n)
    gz("raw/node-label.csv.gz", [str(v) for v in y])
    idx = rng.permutation(n)
    gz("split/time/train.csv.gz", [str(v) for v in idx[:10]])
    gz("split/time/valid.csv.gz", [str(v) for v in idx[10:15]])
    gz("split/time/test.csv.gz", [str(v) for v in idx[15:]])
    (tmp_path / "arxiv_CS_categories.txt").write_text(
        "cs.AI (Artificial Intelligence)\n"
        "Covers all areas of AI.\n"
        "\n"
        "cs.DB (Databases)\n"
        "Covers database management.\n"
        "\n")
    gz("labelidx2arxivcategeory.csv.gz",
       ["label idx,arxiv category", "0,arxiv cs ai", "1,arxiv cs db"])

    ds = load_arxiv_raw(root=str(tmp_path), text_encoder="hash", feat_dim=16)
    assert ds.num_nodes == n
    # symmetrized + coalesced (reference ToUndirected, gen_data.py:123-126)
    pair = np.unique(np.concatenate([edges, edges[:, ::-1]], 0), axis=0)
    assert ds.num_edges == pair.shape[0]
    s = ds.edge_index
    assert set(map(tuple, s.T.tolist())) == set(map(tuple, pair.tolist()))
    np.testing.assert_array_equal(ds.labels, y)
    assert len(ds.splits) == 1 and ds.splits[0]["train"].sum() == 10
    assert ds.class_node_text_feat.shape[0] == 2


def test_arxiv_taxonomy_parses_reference_file():
    """The reference-shipped taxonomy file parses as-is."""
    from stemgnn_tpu.data.raw_parsers import (REFERENCE_SG_ROOT,
                                              parse_arxiv_taxonomy)
    path = os.path.join(REFERENCE_SG_ROOT, "arxiv",
                        "arxiv_CS_categories.txt")
    if not os.path.exists(path):
        pytest.skip("reference tree unavailable")
    tax = parse_arxiv_taxonomy(path)
    assert len(tax) >= 30
    assert all(t["id"].startswith("arxiv cs ") for t in tax)
    assert all(t["name"] and t["description"] for t in tax[:5])


def test_wikics_raw_parser(tmp_path):
    from stemgnn_tpu.data.raw_parsers import load_wikics_raw
    n = 12
    rng = np.random.default_rng(2)
    links = [sorted(set(rng.integers(0, n, 3).tolist()) - {i})
             for i in range(n)]
    labels = rng.integers(0, 3, n).tolist()
    data = {
        "links": links,
        "labels": labels,
        "train_masks": [rng.random(n).tolist() for _ in range(2)],
        "val_masks": [rng.random(n).tolist() for _ in range(2)],
        "test_mask": (rng.random(n) < 0.5).tolist(),
    }
    data["train_masks"] = [[v < 0.3 for v in m] for m in data["train_masks"]]
    data["val_masks"] = [[v < 0.3 for v in m] for m in data["val_masks"]]
    json.dump(data, open(tmp_path / "data.json", "w"))
    meta = {
        "nodes": [{"title": f"Page {i}", "tokens": ["words", f"t{i}"]}
                  for i in range(n)],
        "labels": {str(i): f"category {i}" for i in range(3)},
    }
    json.dump(meta, open(tmp_path / "metadata.json", "w"))
    ds = load_wikics_raw(root=str(tmp_path), text_encoder="hash",
                         feat_dim=16)
    assert ds.num_nodes == n and ds.num_classes == 3
    assert len(ds.splits) == 2
    # undirected coalesced
    s, r = ds.edge_index
    assert set(zip(s.tolist(), r.tolist())) == \
        set(zip(r.tolist(), s.tolist()))


def test_registry_loads_raw_tree(tmp_path, monkeypatch):
    """registry.load_dataset('cora') consumes a raw file tree with no PyG
    cache present (the VERDICT item-6 'Done' criterion)."""
    from stemgnn_tpu.data import importers
    from stemgnn_tpu.data.registry import load_dataset
    monkeypatch.setattr(importers, "DEFAULT_CACHE_ROOT",
                        str(tmp_path / "cache"))
    n, _ = _write_cora_tree(tmp_path)
    ds = load_dataset("cora", feat_dim=16, root=str(tmp_path),
                      num_splits=2)
    assert ds.num_nodes == n and ds.name == "cora"
    # second load hits the npz cache written on first load
    ds2 = load_dataset("cora", feat_dim=16)
    assert ds2.num_nodes == n


def test_citation_split_seed_threading(tmp_path):
    """load_citation_raw honors its seed (ADVICE r3: registry must thread
    the caller's seed into the split draws)."""
    import inspect

    from stemgnn_tpu.data.raw_parsers import _cite_splits, load_citation_raw
    # the loader exposes + forwards a seed parameter
    assert "seed" in inspect.signature(load_citation_raw).parameters
    s0 = _cite_splits(2000, 140, 500, num_splits=2, seed=0)
    s7 = _cite_splits(2000, 140, 500, num_splits=2, seed=7)
    assert not np.array_equal(s0[0]["train"], s7[0]["train"])
    s0b = _cite_splits(2000, 140, 500, num_splits=2, seed=0)
    np.testing.assert_array_equal(s0[0]["train"], s0b[0]["train"])


def test_arxiv_empty_abstract_rows_kept(tmp_path):
    """2-field titleabs.tsv rows (empty abstract) keep their title text
    (ADVICE r3; the reference's pandas join keeps the partial row)."""
    from stemgnn_tpu.data import raw_parsers as rp
    calls = {}
    orig = rp._encode

    def spy(texts, enc, dim):
        if len(texts) == 20:
            calls["node_texts"] = list(texts)
        return orig(texts, enc, dim)

    rp._encode, _ = spy, None
    try:
        test_arxiv_raw_parser(tmp_path)
    finally:
        rp._encode = orig
    assert "title 3" in calls["node_texts"][3]
