"""Data-parallel training on the simulated 8-device mesh: loss must fall and
replicated params must stay in sync (XLA all-reduce correctness)."""

import numpy as np
import jax

from cloudvectordb_tpu.parallel.mesh import make_mesh
from cloudvectordb_tpu.train.trainer import Trainer
from cloudvectordb_tpu.utils.config import EncoderConfig, TrainConfig


def _toy_batches(n_steps, batch=16, max_len=8, vocab=64, seed=0):
    """Learnable structure: positives share the anchor's leading token."""
    rng = np.random.default_rng(seed)
    for _ in range(n_steps):
        topic = rng.integers(1, 8, size=batch)
        anchor = rng.integers(8, vocab, size=(batch, max_len)).astype(np.int32)
        pos = rng.integers(8, vocab, size=(batch, max_len)).astype(np.int32)
        neg = rng.integers(8, vocab, size=(batch, max_len)).astype(np.int32)
        anchor[:, 0] = topic
        pos[:, 0] = topic
        neg[:, 0] = (topic % 7) + 1  # different topic
        ones = np.ones((batch, max_len), np.int32)
        yield {
            "anchor_ids": anchor, "anchor_mask": ones,
            "pos_ids": pos, "pos_mask": ones,
            "neg_ids": neg, "neg_mask": ones,
        }


def test_dp_training_learns(tmp_path):
    mesh = make_mesh(axis_name="data")
    assert mesh.shape["data"] == 8
    cfg = TrainConfig(
        encoder=EncoderConfig(
            vocab_size=64, hidden_dim=32, num_layers=2, num_heads=4, mlp_dim=64,
            max_len=8, dropout=0.0, dtype="float32",
        ),
        loss="infonce", temperature=0.1, batch_size=16, lr=3e-3,
        warmup_steps=5, total_steps=60, ckpt_every=60, log_every=20,
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state()
    losses = []
    step = trainer.step_fn
    for batch in _toy_batches(60):
        state, m = step(state, trainer.place_batch(batch))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.7, losses[::10]


def test_fit_checkpoints_and_resumes(tmp_path):
    mesh = make_mesh(axis_name="data")
    cfg = TrainConfig(
        encoder=EncoderConfig(
            vocab_size=64, hidden_dim=16, num_layers=1, num_heads=2, mlp_dim=32,
            max_len=8, dropout=0.0, dtype="float32",
        ),
        batch_size=16, total_steps=10, ckpt_every=5, log_every=100,
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    trainer = Trainer(cfg, mesh=mesh)
    trainer.fit(_toy_batches(6), resume=False)  # stops mid-run at step 6
    from cloudvectordb_tpu.utils.checkpoint import list_checkpoints

    assert 5 in list_checkpoints(cfg.ckpt_dir)
    # resume picks up from 5 and finishes to 10
    trainer2 = Trainer(cfg, mesh=mesh)
    final = trainer2.fit(_toy_batches(20), resume=True)
    assert int(jax.device_get(final.step)) == 10


def test_resume_skips_consumed_batches(tmp_path):
    """Exact resume: the restored run must NOT replay batches the
    checkpointed run already consumed (data cursor semantics)."""
    mesh = make_mesh(axis_name="data")
    cfg = TrainConfig(
        encoder=EncoderConfig(
            vocab_size=64, hidden_dim=16, num_layers=1, num_heads=2, mlp_dim=32,
            max_len=8, dropout=0.0, dtype="float32",
        ),
        batch_size=16, total_steps=8, ckpt_every=4, log_every=100,
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    Trainer(cfg, mesh=mesh).fit(_toy_batches(4), resume=False)  # ckpt at 4

    consumed = []

    def tracking_stream():
        for i, b in enumerate(_toy_batches(20)):
            consumed.append(i)
            yield b

    trainer2 = Trainer(cfg, mesh=mesh)
    final = trainer2.fit(tracking_stream(), resume=True)
    assert int(jax.device_get(final.step)) == 8
    # batches 0..3 are skipped (fast-forward), 4..7 trained on; the loop may
    # pull one extra batch before the total_steps bound check (not trained)
    assert consumed[:8] == [0, 1, 2, 3, 4, 5, 6, 7] and len(consumed) <= 9
