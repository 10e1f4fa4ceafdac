"""North-star rehearsal (VERDICT r3 missing item 1): the exact real-corpus
chain — raw Planetoid-style file tree -> data/raw_parsers -> first-party
JAX DistilBERT sentence features ('st', dataset/data_utils.py:26 analog) ->
registry npz cache -> pretrain -> finetune — exercised fully OFFLINE with a
synthesized raw tree and a random-weight local ST snapshot.

The real-data blocker is purely environmental (no downloads in this
sandbox); this test pins the whole import path so the moment a real
``cora.pt``/``categories.csv`` tree and a real
multi-qa-distilbert-cos-v1 snapshot appear, pointing ``root`` and
``ST_MODEL_DIR`` at them runs parity experiments with zero code changes.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

D = 48  # ST model dim (divisible by the HF-default 12 heads)

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "quick", "brown", "fox", "jump", "##s", "over", "lazy",
         "dog", "paper", "title", "graph", "node", "##de", "a", "an",
         "and", ",", ".", ":", "feat", "##ure", "about", "proof",
         "computer", "data", "topic", "theory", "system", "ml"]


def test_raw_corpus_st_pretrain_finetune(tmp_path, monkeypatch):
    # ---- 1. synthesized raw cora tree in the reference's raw format
    #         (Cora/gen_data.py:24-94): torch payload + categories.csv,
    #         with planted 3-community structure in both text and edges
    n = 800
    rng = np.random.default_rng(0)
    y = rng.integers(0, 3, n)
    topics = ["the quick brown fox", "lazy dog over fox",
              "paper title graph node"]
    src = rng.integers(0, n, 4 * n)
    same = [np.where(y == c)[0] for c in range(3)]
    dst = np.where(
        rng.random(4 * n) < 0.8,
        np.array([same[y[a]][rng.integers(0, len(same[y[a]]))]
                  for a in src]),
        rng.integers(0, n, 4 * n))
    raw = tmp_path / "raw"
    raw.mkdir()
    torch.save({
        "raw_texts": [f"paper {i}. {topics[y[i]]}" for i in range(n)],
        "label_names": ["theory", "systems", "ml"],
        "y": torch.tensor(y),
        "edge_index": torch.tensor(np.stack([src, dst]).astype(np.int64)),
    }, raw / "cora.pt")
    (raw / "categories.csv").write_text(
        ',description\ntheory,"about proofs"\n'
        "systems,about computers\nml,about data\n")

    # ---- 2. local random-weight ST snapshot for the first-party JAX
    #         DistilBERT forward (nn/distilbert.py; no torch in encode)
    hf_cfg = transformers.DistilBertConfig(
        vocab_size=len(set(VOCAB)), dim=D, n_layers=2, n_heads=12,
        hidden_dim=96, max_position_embeddings=64, dropout=0.0,
        attention_dropout=0.0)
    torch.manual_seed(0)
    m = transformers.DistilBertModel(hf_cfg)
    m.eval()
    st_dir = tmp_path / "st_model"
    st_dir.mkdir()
    seen, rows = set(), []
    for w in VOCAB:
        if w not in seen:
            seen.add(w)
            rows.append(w)
    (st_dir / "vocab.txt").write_text("\n".join(rows) + "\n")
    torch.save(m.state_dict(), st_dir / "pytorch_model.bin")
    monkeypatch.setenv("ST_MODEL_DIR", str(st_dir))

    # ---- 3. registry load: raw parse + ST encode + npz cache
    from stemgnn_tpu.data import importers
    monkeypatch.setattr(importers, "DEFAULT_CACHE_ROOT",
                        str(tmp_path / "cache"))
    from stemgnn_tpu.data.registry import load_dataset
    ds = load_dataset("cora", feat_dim=D, root=str(raw), num_splits=1,
                      text_encoder="st")
    assert ds.num_nodes == n and ds.num_classes == 3
    assert ds.node_text_feat.shape == (n, D)
    # the ST head l2-normalizes (data_utils.py:14-79 semantics)
    np.testing.assert_allclose(
        np.linalg.norm(ds.node_text_feat, axis=1), 1.0, atol=1e-3)

    # ---- 4. pretrain on the ST features
    from stemgnn_tpu.core.config import (EncoderConfig, FinetuneConfig,
                                         PretrainConfig, VQConfig)
    from stemgnn_tpu.data.merge import merge_datasets
    from stemgnn_tpu.train.finetune_loop import run_finetune
    from stemgnn_tpu.train.pretrain_loop import (
        load_pretrained_for_finetune, run_pretrain)
    enc = EncoderConfig(input_dim=D, hidden_dim=D, num_layers=2,
                        normalize="batch", dropout=0.1)
    vq = VQConfig(dim=D, codebook_size=16, codebook_dim=16, heads=4,
                  commitment_weight=0.25, kmeans_init=True)
    pt = PretrainConfig(encoder=enc, vq=vq, epochs=2, batch_size=64,
                        fanout=4, lr=1e-3)
    _, _, _, hist = run_pretrain(merge_datasets([ds]), pt, weights=[1.0],
                                 save_root=str(tmp_path / "ckpt"),
                                 verbose=False)
    assert np.isfinite(hist[-1]["loss"])

    # ---- 5. finetune from the pretrained checkpoint (reference recipe
    #         shape: frozen VQ, full-batch node task)
    bundle = load_pretrained_for_finetune(
        str(tmp_path / "ckpt" / "encoder_2.npz"),
        str(tmp_path / "ckpt" / "vq_2.npz"))
    ft = FinetuneConfig(encoder=enc, vq=vq, task="node", epochs=30,
                        early_stop=15, lr=5e-3, repeat=1, num_classes=3)
    best = run_finetune(ds, ft, pretrained=bundle).get_best()
    assert np.isfinite(best["test"]["mean"])
    # planted community signal (text + 80% intra-class edges) must beat
    # 3-class chance by a wide margin through the whole chain
    assert best["test"]["mean"] > 45, best
