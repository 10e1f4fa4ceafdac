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

dataset2task: Dict[str, str] = {
    "cora": "node", "pubmed": "node", "arxiv": "node", "wikics": "node",
    "cora_synthetic": "node", "arxiv_synthetic": "node",
    "WN18RR": "link", "FB15K237": "link", "kg_synthetic": "link",
    "chemhiv": "graph", "chempcba": "graph", "chemblpre": "graph",
    "mol_synthetic": "graph",
}


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
    if name in ("cora", "pubmed", "arxiv", "wikics", "chemhiv", "chempcba",
                "chemblpre"):
        raise FileNotFoundError(
            f"Dataset '{name}' requires downloaded raw data which is not "
            f"available offline; use '{name}_synthetic' or provide a "
            f"processed cache (see stemgnn_tpu/data/importers.py)")
    raise KeyError(f"Unknown dataset {name}")
