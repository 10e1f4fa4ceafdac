"""First-party BERT (e5) and Llama encoders vs HuggingFace transformers
(offline: random weights, no downloads) — importer + forward + the
reference's pooling semantics (e5: masked mean, NO l2norm; llama: UNMASKED
sequence mean, data_utils.py:80-124)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402

from stemgnn_tpu.nn.bert import (BertConfig, bert_apply, e5_average_pool,
                                 import_hf_bert_state_dict)
from stemgnn_tpu.nn.llama import (LlamaConfig, import_hf_llama_state_dict,
                                  llama_apply, llama_mean_pool)

BCFG = BertConfig(vocab_size=90, dim=32, n_layers=2, n_heads=4,
                  hidden_dim=64, max_position_embeddings=40)


def _hf_bert():
    cfg = transformers.BertConfig(
        vocab_size=BCFG.vocab_size, hidden_size=BCFG.dim,
        num_hidden_layers=BCFG.n_layers, num_attention_heads=BCFG.n_heads,
        intermediate_size=BCFG.hidden_dim,
        max_position_embeddings=BCFG.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    m = transformers.BertModel(cfg)
    m.eval()
    return m


def test_bert_forward_and_e5_pool_match_hf():
    m = _hf_bert()
    params = import_hf_bert_state_dict(m.state_dict(), BCFG)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, BCFG.vocab_size, size=(3, 20)).astype(np.int32)
    mask = np.ones((3, 20), np.int32)
    mask[1, 12:] = 0
    tt = np.zeros((3, 20), np.int32)
    with torch.no_grad():
        out = m(input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
                token_type_ids=torch.tensor(tt, dtype=torch.long))
        want_h = out.last_hidden_state
        tm = torch.tensor(mask, dtype=torch.float32)
        want_pool = (want_h.masked_fill(
            ~torch.tensor(mask, dtype=torch.bool)[..., None], 0.0).sum(1)
            / tm.sum(1)[..., None]).numpy()
        want_h = want_h.numpy()
    got_h = np.asarray(bert_apply(params, BCFG, ids, mask, tt))
    np.testing.assert_allclose(got_h[mask > 0], want_h[mask > 0],
                               rtol=3e-4, atol=3e-5)
    got_pool = np.asarray(e5_average_pool(got_h, mask))
    np.testing.assert_allclose(got_pool, want_pool, rtol=3e-4, atol=3e-5)
    # e5 semantics: NOT unit-norm
    assert not np.allclose(np.linalg.norm(got_pool, axis=-1), 1.0)


LCFG = LlamaConfig(vocab_size=100, dim=32, n_layers=2, n_heads=4,
                   n_kv_heads=4, hidden_dim=56)


def _hf_llama(n_kv=4):
    cfg = transformers.LlamaConfig(
        vocab_size=LCFG.vocab_size, hidden_size=LCFG.dim,
        num_hidden_layers=LCFG.n_layers, num_attention_heads=LCFG.n_heads,
        num_key_value_heads=n_kv, intermediate_size=LCFG.hidden_dim,
        max_position_embeddings=64, attention_dropout=0.0,
        rms_norm_eps=LCFG.rms_norm_eps)
    torch.manual_seed(1)
    m = transformers.LlamaModel(cfg)
    m.eval()
    return m


def test_llama_forward_matches_hf():
    m = _hf_llama()
    params = import_hf_llama_state_dict(m.state_dict(), LCFG)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, LCFG.vocab_size, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        want = m(input_ids=torch.tensor(ids, dtype=torch.long)
                 ).last_hidden_state.numpy()
    got = np.asarray(llama_apply(params, LCFG, ids))
    np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-5)


def test_llama_grouped_kv_matches_hf():
    cfg2 = LlamaConfig(vocab_size=LCFG.vocab_size, dim=LCFG.dim,
                       n_layers=2, n_heads=4, n_kv_heads=2,
                       hidden_dim=LCFG.hidden_dim)
    m = _hf_llama(n_kv=2)
    params = import_hf_llama_state_dict(m.state_dict(), cfg2)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg2.vocab_size, size=(2, 12)).astype(np.int32)
    with torch.no_grad():
        want = m(input_ids=torch.tensor(ids, dtype=torch.long)
                 ).last_hidden_state.numpy()
    got = np.asarray(llama_apply(params, cfg2, ids))
    np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-5)


def test_llama_reference_pooling_semantics():
    """Mean INCLUDES padded positions — byte-faithful to data_utils.py:93."""
    m = _hf_llama()
    params = import_hf_llama_state_dict(m.state_dict(), LCFG)
    ids = np.full((1, 8), 5, np.int32)
    hid = llama_apply(params, LCFG, ids)
    pooled = np.asarray(llama_mean_pool(hid))
    np.testing.assert_allclose(pooled, np.asarray(hid).mean(1), rtol=1e-6)


def test_e5_encoder_end_to_end(tmp_path):
    """get_text_encoder('e5') with a local snapshot matches the HF
    pipeline's (masked-mean, unnormalized) embeddings."""
    from stemgnn_tpu.data.text_encoder import get_text_encoder

    hf_cfg = transformers.BertConfig(
        vocab_size=60, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=1, intermediate_size=96,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(2)
    m = transformers.BertModel(hf_cfg)
    m.eval()
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "fox",
             "dog", "node", "paper", ".", ":"]
    (tmp_path / "vocab.txt").write_text("\n".join(words) + "\n")
    torch.save(m.state_dict(), tmp_path / "pytorch_model.bin")
    enc = get_text_encoder("e5", model_dir=str(tmp_path))
    texts = ["the fox", "paper node: the dog."]
    got = enc.encode(texts)
    hf_tok = transformers.BertTokenizer(vocab_file=str(tmp_path / "vocab.txt"))
    batch = hf_tok(texts, padding=True, return_tensors="pt")
    with torch.no_grad():
        hid = m(input_ids=batch["input_ids"],
                attention_mask=batch["attention_mask"],
                token_type_ids=batch["token_type_ids"]).last_hidden_state
        am = batch["attention_mask"]
        want = (hid.masked_fill(~am.bool()[..., None], 0.0).sum(1)
                / am.sum(1)[..., None].float()).numpy()
    np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-5)
