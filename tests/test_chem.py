"""RDKit-free SMILES featurizer (data/chem.py) vs hand-checked chemistry.

The reference feeds RDKit-derived *text* per atom/bond into the sentence
encoder (STEM-GNN/dataset/data/chemmol/gen_raw_graph.py:93-134); these tests
pin the parser + perception on molecules small enough to verify by hand.
"""

import numpy as np
import pytest

from stemgnn_tpu.data.chem import (SmilesError, mol_dataset_from_smiles,
                                   parse_smiles, smiles2graph)


def _atom_fields(text):
    assert text.startswith("feature node. atom: ")
    return text[len("feature node. atom: "):].split(" , ")


def _bond_fields(text):
    assert text.startswith("feature edge. chemical bond. ")
    return text[len("feature edge. chemical bond. "):].split(" , ")


def test_benzene_aromatic_form():
    g = smiles2graph("c1ccccc1")
    assert len(g["node_feat"]) == 6
    assert g["edge_list"].shape == (12, 2)
    for t in g["node_feat"]:
        f = _atom_fields(t)
        assert f[0] == "Carbon"
        assert f[1] == "atomic number is 6"
        assert f[3] == "degree of 3"          # 2 ring neighbors + 1 H
        assert f[5] == "num of hydrogen is 1"
        assert f[7] == "hybridization is SP2"
        assert f[8] == "is aromatic"
        assert f[9] == "is in ring"
    for t in g["edge_feat"]:
        f = _bond_fields(t)
        assert f[0] == "AROMATIC bond"
        assert f[2] == "is conjugated"
    assert g["cycle"] == 0


def test_benzene_kekule_matches_aromatic():
    a = smiles2graph("c1ccccc1")
    k = smiles2graph("C1=CC=CC=C1")
    assert sorted(a["node_feat"]) == sorted(k["node_feat"])
    assert sorted(a["edge_feat"]) == sorted(k["edge_feat"])


def test_ethanol():
    g = smiles2graph("CCO")
    f0, f1, f2 = map(_atom_fields, g["node_feat"])
    assert f0[3] == "degree of 4" and f0[5] == "num of hydrogen is 3"
    assert f1[3] == "degree of 4" and f1[5] == "num of hydrogen is 2"
    assert f2[0] == "Oxygen"
    assert f2[3] == "degree of 2" and f2[5] == "num of hydrogen is 1"
    for f in (f0, f1, f2):
        assert f[7] == "hybridization is SP3"
        assert f[8] == "not aromatric"        # reference spelling
        assert f[9] == "not in ring"
    assert all(_bond_fields(t)[0] == "SINGLE bond" for t in g["edge_feat"])


def test_acetic_acid_conjugation():
    g = smiles2graph("CC(=O)O")
    # carboxyl carbon is SP2; both C=O and C-OH are conjugated
    f_c2 = _atom_fields(g["node_feat"][1])
    assert f_c2[7] == "hybridization is SP2"
    kinds = {(_bond_fields(t)[0], _bond_fields(t)[2]) for t in g["edge_feat"]}
    assert ("DOUBLE bond", "is conjugated") in kinds
    assert ("SINGLE bond", "is conjugated") in kinds
    # the methyl C-C single bond is NOT conjugated (sp3 carbon side)
    cc = _bond_fields(g["edge_feat"][0])
    assert cc[0] == "SINGLE bond" and cc[2] == "not conjugated"


def test_charged_ammonium():
    g = smiles2graph("[NH4+]")
    f = _atom_fields(g["node_feat"][0])
    assert f[0] == "Nitrogen"
    assert f[4] == "formal charge of 1"
    assert f[5] == "num of hydrogen is 4"
    assert f[3] == "degree of 4"


def test_cyclohexane_vs_benzene():
    g = smiles2graph("C1CCCCC1")
    for t in g["node_feat"]:
        f = _atom_fields(t)
        assert f[7] == "hybridization is SP3"
        assert f[8] == "not aromatric"
        assert f[9] == "is in ring"
        assert f[5] == "num of hydrogen is 2"
    for t in g["edge_feat"]:
        f = _bond_fields(t)
        assert f[0] == "SINGLE bond" and f[2] == "not conjugated"


def test_double_bond_stereo():
    trans = smiles2graph("F/C=C/F")
    cis = smiles2graph("F/C=C\\F")
    def stereo_set(g):
        return {_bond_fields(t)[1] for t in g["edge_feat"]}
    assert "bond stereo is E" in stereo_set(trans)
    assert "bond stereo is Z" in stereo_set(cis)
    assert "bond stereo is Z" not in stereo_set(trans)
    assert "bond stereo is E" not in stereo_set(cis)


def test_pyridine_nitrogen_no_h():
    g = smiles2graph("c1ccncc1")
    n_f = [_atom_fields(t) for t in g["node_feat"]
           if _atom_fields(t)[0] == "Nitrogen"]
    assert len(n_f) == 1
    assert n_f[0][5] == "num of hydrogen is 0"
    assert n_f[0][8] == "is aromatic"


def test_pyrrole_explicit_nh():
    g = smiles2graph("c1cc[nH]c1")
    n_f = [_atom_fields(t) for t in g["node_feat"]
           if _atom_fields(t)[0] == "Nitrogen"][0]
    assert n_f[5] == "num of hydrogen is 1"
    assert n_f[3] == "degree of 3"


def test_alanine_chirality_and_explicit_h():
    g = smiles2graph("N[C@@H](C)C(=O)O")
    f = _atom_fields(g["node_feat"][1])
    assert f[2] == "tetrahedral clockwise chirality"
    assert f[5] == "num of hydrogen is 1"
    assert f[3] == "degree of 4"
    f_ccw = _atom_fields(smiles2graph("N[C@H](C)C(=O)O")["node_feat"][1])
    assert f_ccw[2] == "tetrahedral counter-clockwise chirality"


def test_triple_bond_and_fragments():
    g = smiles2graph("C#N")
    f = map(_atom_fields, g["node_feat"])
    assert all(x[7] == "hybridization is SP" for x in f)
    assert _bond_fields(g["edge_feat"][0])[0] == "TRIPLE bond"
    # dot-separated fragments: no bond across the dot
    g2 = smiles2graph("[Na+].[Cl-]")
    assert len(g2["node_feat"]) == 2 and g2["edge_list"].shape[0] == 0


def test_cycle_score():
    assert smiles2graph("C1CCCCCCC1")["cycle"] == -2   # 8-ring
    assert smiles2graph("C1CCCCC1")["cycle"] == 0
    assert smiles2graph("CCO")["cycle"] == 0


def test_ring_closure_percent_and_errors():
    g = smiles2graph("C%10CCCCC%10")
    assert all(_atom_fields(t)[9] == "is in ring" for t in g["node_feat"])
    with pytest.raises(SmilesError):
        parse_smiles("C1CC")           # unclosed ring
    with pytest.raises(SmilesError):
        parse_smiles("C(C")            # unbalanced paren
    with pytest.raises(SmilesError):
        parse_smiles("CX")             # bad atom


def test_explicit_hydrogen_folding():
    # [H] atoms fold into the heavy neighbor (RDKit removeHs default)
    g = smiles2graph("[H]C([H])([H])O[H]")   # methanol, all H explicit
    assert len(g["node_feat"]) == 2
    f_c, f_o = map(_atom_fields, g["node_feat"])
    assert f_c[5] == "num of hydrogen is 3"
    assert f_o[5] == "num of hydrogen is 1"


def test_mol_dataset_bundle_and_dedup():
    smiles = ["c1ccccc1", "C1=CC=CC=C1", "CCO", "CC(=O)O"]
    labels = np.array([[1, np.nan], [0, 1], [np.nan, 0], [1, 1]], float)
    splits = ["train", "train", "valid", "test"]
    graphs, labs, split = mol_dataset_from_smiles(smiles, labels, splits,
                                                  dim=64)
    assert len(graphs) == 4
    # benzene in both notations -> identical node features
    np.testing.assert_allclose(graphs[0]["node_feat"], graphs[1]["node_feat"])
    assert graphs[0]["node_feat"].shape == (6, 64)
    assert graphs[2]["senders"].shape == (4,)        # CCO: 2 bonds x 2 dirs
    assert split["train"].sum() == 2 and split["test"].sum() == 1
    assert np.isnan(labs[0, 1])


def test_graph_task_trains_on_chem_features():
    """End-to-end: SMILES -> featurized graphs -> run_finetune(graph)."""
    from stemgnn_tpu.core.config import (EncoderConfig, FinetuneConfig,
                                         VQConfig)
    from stemgnn_tpu.train.finetune_loop import run_finetune

    rng = np.random.default_rng(0)
    # label = "contains oxygen" — learnable from node texts
    pool = ["CCO", "CC(=O)O", "OCCO", "c1ccccc1", "CCC", "C1CCCCC1",
            "CCN", "CC(C)C", "COC", "CCCC"]
    smiles = [pool[i % len(pool)] for i in range(60)]
    labels = np.array([[1.0 if "O" in s.upper() else 0.0] for s in smiles])
    names = (["train"] * 40 + ["valid"] * 10 + ["test"] * 10)
    graphs, labs, split = mol_dataset_from_smiles(smiles, labels, names,
                                                  dim=32)
    enc = EncoderConfig(input_dim=32, hidden_dim=32, num_layers=2,
                        normalize="batch", dropout=0.0)
    vq = VQConfig(dim=32, codebook_size=8, codebook_dim=8, heads=2,
                  commitment_weight=0.25)
    cfg = FinetuneConfig(encoder=enc, vq=vq, task="graph", epochs=15,
                         early_stop=15, lr=1e-2, repeat=1, batch_size=16,
                         num_classes=1, freeze_vq=False)
    best = run_finetune((graphs, labs, split), cfg).get_best()
    assert best["test"]["mean"] > 70, best


def test_smiles_csv_registry(tmp_path):
    from stemgnn_tpu.data.registry import dataset2task, load_dataset

    csv_path = tmp_path / "mols.csv"
    csv_path.write_text(
        "smiles,split,hiv_active,tox\n"
        "CCO,train,1,\n"
        "c1ccccc1,train,0,1\n"
        "CC(=O)O,valid,,0\n"
        "C1CCCCC1,test,1,1\n")
    name = f"smiles:{csv_path}"
    assert dataset2task[name] == "graph"
    assert dataset2task.get(name) == "graph"
    assert dataset2task.get("nope") is None
    graphs, labels, split = load_dataset(name, feat_dim=32)
    assert len(graphs) == 4 and labels.shape == (4, 2)
    assert np.isnan(labels[0, 1]) and labels[1, 1] == 1.0
    assert split["valid"].sum() == 1


def test_tfidf_svd_encoder_semantics():
    """tfidf backend: deterministic, unit-norm, similar texts closer than
    dissimilar (the property hash features lack)."""
    import numpy as np

    from stemgnn_tpu.data.text_encoder import get_text_encoder

    texts = ["the cat sat on the mat", "a cat sits on a mat",
             "stochastic gradient descent optimizer",
             "adam optimizer gradient descent"] * 4
    enc = get_text_encoder("tfidf", dim=32)
    emb = enc.encode(texts)
    assert emb.shape == (16, 32)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    sim = emb @ emb.T
    assert sim[0, 1] > sim[0, 2] and sim[2, 3] > sim[1, 3]
    np.testing.assert_allclose(emb, get_text_encoder("tfidf", dim=32)
                               .encode(texts), atol=1e-6)


def test_dataset_cache_roundtrips_extras(tmp_path):
    import numpy as np

    from stemgnn_tpu.data.dataset import TAGDataset
    from stemgnn_tpu.data.importers import (load_dataset_cache,
                                            save_dataset_cache)

    ds = TAGDataset(
        name="toy", node_text_feat=np.eye(4, 8, dtype=np.float32),
        edge_text_feat=np.ones((1, 8), np.float32),
        x=np.arange(4), xe=np.zeros(3, np.int64),
        edge_index=np.asarray([[0, 1, 2], [1, 2, 3]]),
        labels=np.asarray([0, 1, 0]), splits=None,
        class_node_text_feat=None, num_classes=2, num_tasks=1,
        extras={"relations": ["a", "b"], "split_counts": [2, 1, 0]})
    save_dataset_cache(ds, "hash", root=str(tmp_path))
    back = load_dataset_cache("toy", "hash", 8, root=str(tmp_path))
    assert back.extras["split_counts"] == [2, 1, 0]
    assert back.extras["relations"] == ["a", "b"]
    np.testing.assert_array_equal(back.edge_index, ds.edge_index)


def test_mol_bundle_indexed_matches_materialized():
    """The indexed (id-based) graph-task bundle trains/evaluates identically
    to the materialized one — same graphs, same tables, device-side gather."""
    import jax
    from stemgnn_tpu.core.config import EncoderConfig, FinetuneConfig, VQConfig
    from stemgnn_tpu.data.chem import mol_dataset_from_smiles
    from stemgnn_tpu.train.finetune_loop import run_finetune

    smiles = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "C#N", "CCOC", "CNC",
              "O=C=O", "c1ccncc1", "CCS"] * 4
    labels = np.asarray([[float(i % 2)] for i in range(len(smiles))])
    split_names = (["train"] * 24 + ["valid"] * 8 + ["test"] * 8)
    kw = dict(dim=16)
    g_mat, y, split = mol_dataset_from_smiles(smiles, labels, split_names,
                                              **kw)
    g_idx, y2, split2 = mol_dataset_from_smiles(smiles, labels, split_names,
                                                indexed=True, **kw)
    assert len(g_idx) == len(g_mat)
    assert g_idx.node_table.shape[1] == 16

    cfg = FinetuneConfig(
        encoder=EncoderConfig(input_dim=16, hidden_dim=16, num_layers=2,
                              normalize="batch", dropout=0.0),
        vq=VQConfig(dim=16, codebook_size=8, codebook_dim=8, heads=2,
                    commitment_weight=0.25),
        task="graph", epochs=4, early_stop=10, lr=5e-3, repeat=1,
        num_classes=1, batch_size=8, use_vq=False)
    b_mat = run_finetune((g_mat, y, split), cfg).get_best()
    b_idx = run_finetune((g_idx, y2, split2), cfg).get_best()
    # identical math (features are the same rows, gathered on device)
    np.testing.assert_allclose(b_idx["test"]["mean"], b_mat["test"]["mean"],
                               rtol=1e-4, atol=1e-3)


def test_graph_eval_bf16_parity():
    """eval_bf16 (r5, VERDICT item 6): the bf16 eval forward reproduces
    the f32 run's quality — AUCs within noise — while training stays f32
    (same seeds => same training trajectory up to eval-driven early
    stopping)."""
    from stemgnn_tpu.core.config import (EncoderConfig, FinetuneConfig,
                                         VQConfig)
    from stemgnn_tpu.data.synthetic import synthetic_graph_dataset
    from stemgnn_tpu.train.finetune_loop import run_finetune
    import dataclasses

    bundle = synthetic_graph_dataset(num_graphs=90, num_tasks=2, feat_dim=32,
                                     seed=2)
    enc = EncoderConfig(input_dim=32, hidden_dim=32, num_layers=2,
                        normalize="batch", dropout=0.0)
    vq = VQConfig(dim=32, codebook_size=8, codebook_dim=8, heads=2,
                  commitment_weight=0.25)
    cfg = FinetuneConfig(encoder=enc, vq=vq, task="graph", epochs=8,
                         early_stop=10, lr=1e-2, repeat=1, batch_size=16,
                         num_classes=2, freeze_vq=False)
    a = run_finetune(bundle, cfg).get_best()
    b = run_finetune(bundle,
                     dataclasses.replace(cfg, eval_bf16=True)).get_best()
    assert abs(a["test"]["mean"] - b["test"]["mean"]) < 3.0, (a, b)
    assert abs(a["val"]["mean"] - b["val"]["mean"]) < 3.0, (a, b)


def test_graph_eval_batch_size_invariance():
    """cfg.eval_batch_size (r5): per-graph predictions are exactly
    invariant to the eval batch partition, so bigger eval batches change
    nothing but the dispatch count."""
    from stemgnn_tpu.core.config import (EncoderConfig, FinetuneConfig,
                                         VQConfig)
    from stemgnn_tpu.data.synthetic import synthetic_graph_dataset
    from stemgnn_tpu.train.finetune_loop import run_finetune
    import dataclasses

    bundle = synthetic_graph_dataset(num_graphs=120, num_tasks=2,
                                     feat_dim=32, seed=4)
    enc = EncoderConfig(input_dim=32, hidden_dim=32, num_layers=2,
                        normalize="batch", dropout=0.0)
    vq = VQConfig(dim=32, codebook_size=8, codebook_dim=8, heads=2,
                  commitment_weight=0.25, kmeans_init=True)
    cfg = FinetuneConfig(encoder=enc, vq=vq, task="graph", epochs=6,
                         early_stop=10, lr=1e-2, repeat=1, batch_size=16,
                         num_classes=2, freeze_vq=False)
    a = run_finetune(bundle, cfg).get_best()
    b = run_finetune(bundle, dataclasses.replace(
        cfg, eval_batch_size=64)).get_best()
    # same training stream (eval does not touch the rng/opt state), same
    # per-graph predictions -> identical best metrics
    assert a == b, (a, b)


def test_graph_eval_train_auc_skip():
    """eval_train_auc=False (r5): val/test AUCs and the selected best
    epoch are unchanged (selection reads val only); train reports NaN."""
    from stemgnn_tpu.core.config import (EncoderConfig, FinetuneConfig,
                                         VQConfig)
    from stemgnn_tpu.data.synthetic import synthetic_graph_dataset
    from stemgnn_tpu.train.finetune_loop import run_finetune
    import dataclasses

    bundle = synthetic_graph_dataset(num_graphs=100, num_tasks=2,
                                     feat_dim=32, seed=5)
    enc = EncoderConfig(input_dim=32, hidden_dim=32, num_layers=2,
                        normalize="batch", dropout=0.0)
    vq = VQConfig(dim=32, codebook_size=8, codebook_dim=8, heads=2,
                  commitment_weight=0.25, kmeans_init=True)
    cfg = FinetuneConfig(encoder=enc, vq=vq, task="graph", epochs=6,
                         early_stop=10, lr=1e-2, repeat=1, batch_size=16,
                         num_classes=2, freeze_vq=False)
    a = run_finetune(bundle, cfg).get_best()
    b = run_finetune(bundle, dataclasses.replace(
        cfg, eval_train_auc=False)).get_best()
    assert a["val"] == b["val"] and a["test"] == b["test"], (a, b)
    assert np.isnan(b["train"]["mean"]), b
