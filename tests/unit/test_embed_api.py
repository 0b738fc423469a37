"""models/embed: text_encoder closure + batch-padding invariants."""

import numpy as np

from cloudvectordb_tpu.data.synthetic import synthetic_corpus
from cloudvectordb_tpu.data.tokenize import TextTokenizer
from cloudvectordb_tpu.models.embed import encode_corpus, text_encoder
from cloudvectordb_tpu.models.encoder import init_encoder
from cloudvectordb_tpu.utils.config import EncoderConfig


def test_text_encoder_matches_encode_corpus():
    corpus = synthetic_corpus(50, seed=200)
    tok = TextTokenizer.train(corpus, vocab_size=512, max_len=16)
    cfg = EncoderConfig(vocab_size=max(tok.vocab_size, 8), hidden_dim=32,
                        num_layers=1, num_heads=4, mlp_dim=64, max_len=16,
                        dropout=0.0, dtype="float32")
    model, params = init_encoder(cfg, seed=0)
    enc = text_encoder(model, params, tok, batch_size=16)
    out1 = enc(corpus)
    out2 = encode_corpus(model, params, tok, corpus, batch_size=16)
    np.testing.assert_allclose(out1, out2, atol=1e-6)
    assert out1.shape == (50, 32)
    np.testing.assert_allclose(np.linalg.norm(out1, axis=1), 1.0, rtol=1e-5)
    # batch size must not change results (padding correctness)
    out3 = encode_corpus(model, params, tok, corpus, batch_size=7)
    np.testing.assert_allclose(out1, out3, atol=1e-5)
    # empty input
    assert enc([]).shape[0] == 0
