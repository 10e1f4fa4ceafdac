"""Dataset registry: name -> loader.

The analog of the reference's ``name2dataset`` + ``get_finetune_graph``
dispatch (STEM-GNN/dataset/task_constructor.py:20-22,
process_datasets.py:297-307).  Loaders return :class:`TAGDataset` for
node/link tasks and (graphs, labels, split) for graph tasks.

Downloadable datasets (cora/pubmed/arxiv/wikics, chem*) require their raw
files; in offline environments the ``*_synthetic`` stand-ins and the KG
datasets (raw triples ship with the reference checkout) are available.
"""

from __future__ import annotations

from typing import Dict

from stemgnn_tpu.data import synthetic
from stemgnn_tpu.data.kg import REFERENCE_KG_ROOT, load_kg_dataset

class _Dataset2Task(dict):
    """dict with the 'smiles:<csv>' prefix mapped to the graph task."""

    def __missing__(self, key):
        if isinstance(key, str) and key.startswith("smiles:"):
            return "graph"
        raise KeyError(key)

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default


dataset2task: Dict[str, str] = _Dataset2Task({
    "cora": "node", "pubmed": "node", "arxiv": "node", "wikics": "node",
    "cora_synthetic": "node", "arxiv_synthetic": "node",
    "arxiv_synthetic_fragile": "node", "arxiv_synthetic_pl": "node",
    "WN18RR": "link", "FB15K237": "link", "kg_synthetic": "link",
    "chemhiv": "graph", "chempcba": "graph", "chemblpre": "graph",
    "mol_synthetic": "graph",
})


def load_dataset(name: str, feat_dim: int = 768, seed: int = 0,
                 text_encoder: str = "hash", **kw):
    if name == "cora_synthetic":
        return synthetic.synthetic_node_dataset(
            name=name, feat_dim=feat_dim, seed=seed, **kw)
    if name == "arxiv_synthetic":
        return synthetic.synthetic_node_dataset(
            name=name, num_nodes=kw.pop("num_nodes", 169_343),
            num_classes=kw.pop("num_classes", 40), feat_dim=feat_dim,
            avg_degree=kw.pop("avg_degree", 14), num_splits=1, seed=seed, **kw)
    if name == "arxiv_synthetic_pl":
        # power-law variant (r5): preferential-attachment skew so the
        # degree distribution — and therefore the hub-dense aggregation
        # path — matches real citation graphs (ogbn-arxiv is power-law;
        # the plain arxiv_synthetic is homophilous-uniform, BASELINE r5)
        return synthetic.synthetic_node_dataset(
            name=name, num_nodes=kw.pop("num_nodes", 169_343),
            num_classes=kw.pop("num_classes", 40), feat_dim=feat_dim,
            avg_degree=kw.pop("avg_degree", 14), num_splits=1,
            pref_attach=kw.pop("pref_attach", 1.1), seed=seed, **kw)
    if name == "arxiv_synthetic_fragile":
        # perturbation-SENSITIVE arxiv-scale variant (r4 VERDICT item 5):
        # sparse signal subspace + half the nodes signal-free (class
        # recoverable only via neighbors) — missing-feature and edge-drop
        # sweeps degrade gradedly instead of reading ~100 everywhere
        return synthetic.synthetic_node_dataset(
            name=name, num_nodes=kw.pop("num_nodes", 169_343),
            num_classes=kw.pop("num_classes", 40), feat_dim=feat_dim,
            avg_degree=kw.pop("avg_degree", 14), num_splits=1,
            signal_dims=kw.pop("signal_dims", 16),
            structure_frac=kw.pop("structure_frac", 0.5),
            train_per_split=kw.pop("train_per_split", 8_000),
            val_per_split=kw.pop("val_per_split", 4_000),
            seed=seed, **kw)
    if name == "kg_synthetic":
        return synthetic.synthetic_link_dataset(name=name, feat_dim=feat_dim,
                                                seed=seed, **kw)
    if name == "mol_synthetic":
        return synthetic.synthetic_graph_dataset(name=name, feat_dim=feat_dim,
                                                 seed=seed, **kw)
    if name in ("WN18RR", "FB15K237"):
        root = kw.pop("root", REFERENCE_KG_ROOT)
        return load_kg_dataset(name, root=root, text_encoder=text_encoder,
                               feat_dim=feat_dim, **kw)
    if name.startswith("smiles:"):
        # Bring-your-own molecules: "smiles:/path/to/file.csv" with columns
        # smiles,split,<task columns...> (empty cells = NaN labels).  The
        # full chem featurizer (data/chem.py) runs offline — no RDKit, no
        # downloads.
        return load_smiles_csv(name[len("smiles:"):], feat_dim=feat_dim,
                               text_encoder=text_encoder, **kw)
    if name in ("cora", "pubmed", "arxiv", "wikics"):
        # priority: processed npz cache -> RAW file tree (no PyG/OGB
        # needed, data/raw_parsers.py) -> error with guidance
        from stemgnn_tpu.data.importers import (load_dataset_cache,
                                                save_dataset_cache)
        cached = load_dataset_cache(name, text_encoder, feat_dim)
        if cached is not None:
            # the cache key is seed-less (features are seed-independent);
            # re-draw the seeded splits so the caller's seed is honored on
            # cache hits too (r4 self-review: cache otherwise pins every
            # run to whichever seed populated it)
            if name in ("cora", "pubmed") and seed:
                import dataclasses

                from stemgnn_tpu.data.raw_parsers import _cite_splits
                tr_n, va_n = (140, 500) if name == "cora" else (60, 500)
                n_splits = len(cached.splits) if cached.splits else 10
                cached = dataclasses.replace(
                    cached, splits=_cite_splits(cached.num_nodes, tr_n,
                                                va_n, n_splits, seed=seed))
            return cached
        from stemgnn_tpu.data import raw_parsers as rp
        root = kw.pop("root", None)
        try:
            if name in ("cora", "pubmed"):
                ds = rp.load_citation_raw(name, root=root,
                                          text_encoder=text_encoder,
                                          feat_dim=feat_dim, seed=seed, **kw)
            elif name == "arxiv":
                ds = rp.load_arxiv_raw(root=root, text_encoder=text_encoder,
                                       feat_dim=feat_dim, **kw)
            else:
                ds = rp.load_wikics_raw(root=root,
                                        text_encoder=text_encoder,
                                        feat_dim=feat_dim, **kw)
            save_dataset_cache(ds, text_encoder)
            return ds
        except FileNotFoundError as ex:
            raise FileNotFoundError(
                f"Dataset '{name}': no processed cache and the raw file "
                f"tree is incomplete ({ex}).  Supply the raw files "
                f"(data/raw_parsers.py documents the formats: cora.pt/"
                f"pubmed.pt + categories.csv, the OGB csv.gz tree + "
                f"titleabs.tsv, or wikics data.json + metadata.json), "
                f"import a reference PyG cache "
                f"(stemgnn_tpu/data/importers.py), or use "
                f"'{name}_synthetic'") from ex
    if name in ("chemhiv", "chempcba", "chemblpre"):
        raise FileNotFoundError(
            f"Dataset '{name}' requires downloaded raw data which is not "
            f"available offline; use 'mol_synthetic', a processed cache "
            f"(stemgnn_tpu/data/importers.py), or a local "
            f"'smiles:<csv>' file (data/chem.py featurizes without RDKit)")
    raise KeyError(f"Unknown dataset {name}")


def load_smiles_csv(path: str, feat_dim: int = 768,
                    text_encoder: str = "hash"):
    """CSV -> graph-task bundle via the RDKit-free featurizer.

    Expected header: ``smiles,split,<task1>[,<task2>...]``; split in
    train/valid/test; label cells 0/1 or empty (NaN).  Mirrors the
    reference's chem gen_data flow (chemmol/gen_data.py:52-63) for local
    files instead of the HF download.
    """
    import csv

    import numpy as np

    from stemgnn_tpu.data.chem import mol_dataset_from_smiles
    from stemgnn_tpu.data.text_encoder import get_text_encoder

    smiles, splits, labels = [], [], []
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        if header[:2] != ["smiles", "split"]:
            raise ValueError(
                f"{path}: header must start with 'smiles,split', got {header[:2]}")
        for row in reader:
            if not row:
                continue
            smiles.append(row[0])
            splits.append(row[1])
            labels.append([float(v) if v.strip() != "" else np.nan
                           for v in row[2:]])
    enc = get_text_encoder(text_encoder, dim=feat_dim)
    # indexed bundle: id-based graphs + shared dedup tables — at chempcba
    # scale the materialized form needs ~84 GB host RAM and ~305 s/epoch of
    # host batch building vs ~15 s indexed (scripts/bench_graph_eval.py)
    return mol_dataset_from_smiles(smiles, np.asarray(labels, float), splits,
                                   encoder=enc, dim=feat_dim, indexed=True)
