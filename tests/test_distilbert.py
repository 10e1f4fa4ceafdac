"""First-party DistilBERT vs HuggingFace transformers (offline: random
weights, no downloads).  Covers the HF state-dict importer, the forward
(post-LN blocks, masked attention), mean-pool+l2norm head, and the
WordPiece tokenizer vs the HF reference implementation."""

import numpy as np
import pytest

from stemgnn_tpu.nn.distilbert import (DistilBertConfig, WordPieceTokenizer,
                                       distilbert_apply, distilbert_init,
                                       import_hf_state_dict,
                                       mean_pool_normalize)

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

CFG = DistilBertConfig(vocab_size=120, dim=32, n_layers=2, n_heads=4,
                       hidden_dim=64, max_position_embeddings=48)


def _hf_model():
    hf_cfg = transformers.DistilBertConfig(
        vocab_size=CFG.vocab_size, dim=CFG.dim, n_layers=CFG.n_layers,
        n_heads=CFG.n_heads, hidden_dim=CFG.hidden_dim,
        max_position_embeddings=CFG.max_position_embeddings,
        dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(0)
    m = transformers.DistilBertModel(hf_cfg)
    m.eval()
    return m


def test_forward_matches_hf():
    m = _hf_model()
    params = import_hf_state_dict(m.state_dict(), CFG)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, size=(3, 24)).astype(np.int32)
    mask = np.ones((3, 24), np.int32)
    mask[0, 15:] = 0
    mask[2, 5:] = 0
    ids = np.where(mask > 0, ids, 0)
    with torch.no_grad():
        want = m(input_ids=torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long)
                 ).last_hidden_state.numpy()
    got = np.asarray(distilbert_apply(params, CFG, ids, mask))
    # padded positions may differ (we never read them); compare valid rows
    np.testing.assert_allclose(got[mask > 0], want[mask > 0],
                               rtol=2e-4, atol=2e-5)


def test_mean_pool_matches_st_head():
    m = _hf_model()
    params = import_hf_state_dict(m.state_dict(), CFG)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[1, 9:] = 0
    with torch.no_grad():
        hidden = m(input_ids=torch.tensor(ids, dtype=torch.long),
                   attention_mask=torch.tensor(mask, dtype=torch.long)
                   ).last_hidden_state
        tm = torch.tensor(mask, dtype=torch.float32)[..., None]
        want = (hidden * tm).sum(1) / tm.sum(1).clamp(min=1e-9)
        want = torch.nn.functional.normalize(want, p=2, dim=-1).numpy()
    hid = distilbert_apply(params, CFG, ids, mask)
    got = np.asarray(mean_pool_normalize(hid, mask))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, rtol=1e-5)


VOCAB_WORDS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
               "the", "quick", "brown", "fox", "jump", "##s", "##ed",
               "over", "lazy", "dog", "entity", "name", "##s", "paper",
               "title", "graph", "node", "##de", "a", "an", "and", ",",
               ".", ":", "!", "?", "'", "2", "##0", "feat", "##ure",
               "descr", "##iption", "un", "##known"]


def _write_vocab(tmp_path):
    # dedupe preserving order (HF vocab files must have unique rows)
    seen, rows = set(), []
    for w in VOCAB_WORDS:
        if w not in seen:
            seen.add(w)
            rows.append(w)
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(rows) + "\n", encoding="utf-8")
    return str(p)


def test_tokenizer_matches_hf(tmp_path):
    path = _write_vocab(tmp_path)
    hf = transformers.DistilBertTokenizer(vocab_file=path,
                                          do_lower_case=True)
    tok = WordPieceTokenizer.from_vocab_file(path)
    texts = [
        "The quick brown fox jumps over the lazy dog.",
        "feature node. paper title and description: Unknown Entity!",
        "Graph nodes, 20 entities: names?  and 'quotes'",
        "",
        "zzz unknownword THE FOX",
    ]
    for t in texts:
        want = hf.encode(t, add_special_tokens=True, truncation=True,
                         max_length=32)
        got = tok.encode(t, max_length=32)
        assert got == want, (t, got, want)


def test_batch_padding(tmp_path):
    path = _write_vocab(tmp_path)
    tok = WordPieceTokenizer.from_vocab_file(path)
    ids, mask = tok.batch(["the fox", "the quick brown fox jumps over the "
                           "lazy dog and the fox"], pad_multiple=8)
    assert ids.shape == mask.shape
    assert ids.shape[1] % 8 == 0
    assert (ids[mask == 0] == tok.pad).all()


def test_random_init_runs():
    import jax
    params = distilbert_init(jax.random.PRNGKey(0), CFG)
    ids = np.zeros((2, 8), np.int32)
    mask = np.ones((2, 8), np.int32)
    out = distilbert_apply(params, CFG, ids, mask)
    assert np.isfinite(np.asarray(out)).all()


def test_jax_sentence_encoder_end_to_end(tmp_path):
    """get_text_encoder('st') loads a local HF snapshot into the in-repo
    JAX forward and matches the torch pipeline's embeddings."""
    from stemgnn_tpu.data.text_encoder import get_text_encoder

    # a small random DistilBERT snapshot on disk (n_heads stays the HF
    # default 12, which the loader assumes; dim must divide by it)
    hf_cfg = transformers.DistilBertConfig(
        vocab_size=60, dim=48, n_layers=2, n_heads=12, hidden_dim=96,
        max_position_embeddings=64, dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(1)
    m = transformers.DistilBertModel(hf_cfg)
    m.eval()
    vocab_path = _write_vocab(tmp_path)
    torch.save(m.state_dict(), tmp_path / "pytorch_model.bin")

    enc = get_text_encoder("st", model_dir=str(tmp_path))
    texts = ["the quick brown fox", "feature node. paper title: dog!"]
    got = enc.encode(texts)
    assert got.shape == (2, 48)

    hf_tok = transformers.DistilBertTokenizer(vocab_file=vocab_path,
                                              do_lower_case=True)
    batch = hf_tok(texts, padding=True, return_tensors="pt")
    with torch.no_grad():
        hid = m(**batch).last_hidden_state
        tm = batch["attention_mask"][..., None].float()
        want = (hid * tm).sum(1) / tm.sum(1).clamp(min=1e-9)
        want = torch.nn.functional.normalize(want, p=2, dim=-1).numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)
