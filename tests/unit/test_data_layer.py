"""Tokenizer training, corpus chunking, triplet mining."""

import numpy as np

from cloudvectordb_tpu.data.corpus import chunk_document, load_passages
from cloudvectordb_tpu.data.synthetic import synthetic_corpus
from cloudvectordb_tpu.data.tokenize import TextTokenizer
from cloudvectordb_tpu.data.triplets import mine_triplets, triplet_batches
from cloudvectordb_tpu.utils.config import DataConfig, MiningConfig


def test_tokenizer_train_encode_roundtrip(tmp_path):
    corpus = synthetic_corpus(200, seed=0)
    tok = TextTokenizer.train(corpus, vocab_size=512, max_len=32)
    ids, mask = tok.encode_batch(corpus[:4])
    assert ids.shape == (4, 32) and mask.shape == (4, 32)
    assert mask.sum(axis=1).min() >= 3  # CLS + content + SEP
    tok.save(tmp_path / "tok.json")
    tok2 = TextTokenizer.load(tmp_path / "tok.json", 32)
    ids2, _ = tok2.encode_batch(corpus[:4])
    np.testing.assert_array_equal(ids, ids2)


def test_chunking():
    text = " ".join(f"w{i}" for i in range(500))
    chunks = chunk_document(text, max_words=100, stride=80)
    assert all(len(c.split()) <= 100 for c in chunks)
    covered = set()
    for c in chunks:
        covered.update(c.split())
    assert len(covered) == 500  # no word lost


def test_load_passages_synthetic():
    cfg = DataConfig(corpus="synthetic", num_docs=50)
    passages, doc_ids = load_passages(cfg)
    assert len(passages) == len(doc_ids) == 50


def test_inbatch_mining_and_batches():
    passages = synthetic_corpus(100, seed=1)
    doc_ids = list(range(100))
    trip = mine_triplets(passages, doc_ids, MiningConfig(strategy="inbatch", num_triplets=64))
    assert len(trip) == 64
    # negative comes from a different doc than the anchor
    for a, n in zip(trip.anchors[:16], trip.negatives[:16]):
        assert a != n
    tok = TextTokenizer.train(passages, vocab_size=512, max_len=16)
    b = next(triplet_batches(trip, tok, batch_size=8, max_len=16))
    assert b["anchor_ids"].shape == (8, 16)
    assert set(b) == {
        "anchor_ids", "anchor_mask", "pos_ids", "pos_mask", "neg_ids", "neg_mask"
    }


def test_triplets_save_load(tmp_path):
    passages = synthetic_corpus(20, seed=2)
    trip = mine_triplets(passages, list(range(20)), MiningConfig(num_triplets=10))
    trip.save(tmp_path / "t.jsonl")
    from cloudvectordb_tpu.data.triplets import Triplets

    t2 = Triplets.load(tmp_path / "t.jsonl")
    assert t2.anchors == trip.anchors and t2.negatives == trip.negatives


def test_triplet_batches_skip_matches_consume():
    """Resume fast-forward: skip(n) must land on EXACTLY the batch that
    consuming n batches lands on (same RNG stream, same cursor), across an
    epoch boundary, without tokenizing the skipped batches."""
    passages = synthetic_corpus(40, seed=2)
    doc_ids = list(range(40))
    tok = TextTokenizer.train(passages, vocab_size=512, max_len=16)
    trip = mine_triplets(passages, doc_ids, MiningConfig(num_triplets=50))
    mk = lambda: triplet_batches(trip, tok, batch_size=8, max_len=16,
                                 seed=3, epochs=4)
    a = mk()
    for _ in range(9):  # 6 batches/epoch at 50/8 -> crosses into epoch 2
        next(a)
    want = next(a)  # the 10th batch
    b = mk()
    b.skip(9)
    got = next(b)
    for kk in want:
        np.testing.assert_array_equal(want[kk], got[kk])


def test_triplet_batches_too_few_raises():
    import pytest

    passages = synthetic_corpus(20, seed=4)
    doc_ids = list(range(20))
    tok = TextTokenizer.train(passages, vocab_size=512, max_len=16)
    trip = mine_triplets(passages, doc_ids, MiningConfig(num_triplets=4))
    with pytest.raises(ValueError):
        triplet_batches(trip, tok, batch_size=64, max_len=16)
