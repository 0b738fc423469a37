"""On-chip encoder throughput: flagship MiniLM-class config, fwd-only encode
and full train step — feeds the BASELINE "<1h build from raw text" budget.

Data generated on device; fencing via device_get (axon tunnel semantics).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    import dataclasses

    from cloudvectordb_tpu.models.encoder import init_encoder
    from cloudvectordb_tpu.models.presets import get_preset
    from cloudvectordb_tpu.utils.config import EncoderConfig, TrainConfig
    from cloudvectordb_tpu.train.trainer import Trainer
    from cloudvectordb_tpu.eval.qps import measure_fetch_rtt

    # PRESET selects the encoder scale (r5 VERDICT item 4: the blueprint's
    # config-#3 encoder is 768-d — PRESET=bert-base-768 measures it); the
    # default stays the r3/r4 flagship MiniLM-L6 so rounds compare.
    preset = os.environ.get("PRESET")
    if preset:
        cfg = dataclasses.replace(get_preset(preset), max_len=128)
    else:
        cfg = EncoderConfig(max_len=128)  # 384-d, 6 layers, 30522 vocab
    model, params = init_encoder(cfg, seed=0)
    B = int(os.environ.get("ENC_B", "512"))

    fwd = jax.jit(lambda p, i, m: model.apply({"params": p}, i, m, True))

    @jax.jit
    def mkbatch(key):
        ids = jax.random.randint(key, (B, cfg.max_len), 0, cfg.vocab_size)
        return ids, jnp.ones_like(ids)

    rtt = measure_fetch_rtt()
    keys = [jax.random.PRNGKey(i) for i in range(8)]
    batches = [mkbatch(k) for k in keys]
    float(jnp.sum(fwd(params, *batches[0])))  # compile
    iters = 6
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for i in range(iters):
        acc = acc + jnp.sum(fwd(params, *batches[i % 8]))
    float(acc)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    enc_ps = B * iters / dt
    print(f"encode fwd (B={B}, L={cfg.max_len}): {enc_ps:,.0f} passages/s/chip", flush=True)
    print(f"  → 1M wiki passages in {1e6/enc_ps:,.0f} s/chip; "
          f"100M on v5e-8 in {1e8/(8*enc_ps)/60:,.1f} min", flush=True)

    # full train step (anchor+pos+neg stacked = 3B fwd + bwd) at MiniLM-L6
    # scale — B from TRAIN_B (default 512 per BASELINE's MS MARCO config).
    # r4 ablation (VERDICT item 4): attention implementation × dropout —
    # the naive path writes three (3B, H, L, L) f32 tensors to HBM per
    # layer; the fused Pallas flash kernel (attn_impl='fused') keeps the
    # running softmax in VMEM. Same-session controls in one process.
    import numpy as np

    tb = int(os.environ.get("TRAIN_B", "512"))

    def time_train(enc_cfg, label):
        tcfg = TrainConfig(encoder=enc_cfg, batch_size=tb, total_steps=1)
        trainer = Trainer(tcfg)
        state = trainer.init_state()
        rng = np.random.default_rng(0)

        def mk_train(i):
            b = tcfg.batch_size
            r = lambda: rng.integers(  # noqa: E731
                0, enc_cfg.vocab_size, (b, enc_cfg.max_len)).astype(np.int32)
            ones = np.ones((b, enc_cfg.max_len), np.int32)
            return {
                "anchor_ids": r(), "anchor_mask": ones,
                "pos_ids": r(), "pos_mask": ones,
                "neg_ids": r(), "neg_mask": ones,
            }

        step = trainer.step_fn
        state, m = step(state, trainer.place_batch(mk_train(0)))  # compile
        loss0 = float(m["loss"])
        # pre-place batches so the timed region measures the device step,
        # not the host→device transfer (rides the ~23 MB/s dev relay here)
        iters = 4
        placed = [trainer.place_batch(mk_train(i + 1)) for i in range(iters)]
        t0 = time.perf_counter()
        for b in placed:
            state, m = step(state, b)
        float(m["loss"])
        dt = max(time.perf_counter() - t0 - rtt, 1e-9)
        tps = tcfg.batch_size * iters / dt
        # step-time MFU: 6·N_nonembed FLOPs per trained token (fwd 2N +
        # bwd 4N), 3 legs per triplet, vs the v5e bf16 peak (197 TFLOP/s)
        n_p = sum(int(x.size) for x in jax.tree_util.tree_leaves(
            state.params))
        n_embed = (enc_cfg.vocab_size * enc_cfg.hidden_dim
                   + enc_cfg.max_len * enc_cfg.hidden_dim)
        flops_step = 6 * (n_p - n_embed) * 3 * tcfg.batch_size * enc_cfg.max_len
        mfu = flops_step / (dt / iters) / 197e12
        print(
            f"train[{label}] (B={tb} triplets, L={enc_cfg.max_len}, "
            f"{n_p/1e6:.1f}M params): {tps:,.0f} triplets/s/chip "
            f"({dt/iters*1000:.0f} ms/step, MFU {mfu:.1%}, "
            f"loss0 {loss0:.3f})", flush=True)
        print(f"  → MS MARCO-size epoch (500k triplets): {5e5/tps/60:.1f} "
              f"min/chip; {5e5/(8*tps)/60:.1f} min on v5e-8 DP", flush=True)
        return dt / iters

    time_train(dataclasses.replace(cfg, attn_impl="naive"),
               "naive, full dropout (r3 baseline)")
    time_train(dataclasses.replace(cfg, attn_impl="naive", attn_dropout=0.0),
               "naive, attn_dropout=0 (r3 best)")
    time_train(dataclasses.replace(cfg, attn_impl="packed", attn_dropout=0.0),
               "PACKED small-head kernel, attn_dropout=0 (r4)")
    if os.environ.get("FUSED") == "1":
        # r4 measured NEGATIVE result at this geometry (head_dim=32): the
        # flash kernel lane-pads 32→128 (4× every block; fwd 8.9k→5.9k
        # passages/s) and its bwd padded temps exceed HBM by ~27 MB at
        # B=512. Kept behind an env flag for head_dim≥128 configs.
        time_train(dataclasses.replace(cfg, attn_impl="fused",
                                       attn_dropout=0.0),
                   "FUSED flash attention, attn_dropout=0")

    # numerical sanity: fused vs naive forward on one batch (deterministic)
    m_n, p_n = init_encoder(
        dataclasses.replace(cfg, attn_impl="naive"), seed=0)
    m_f, p_f = init_encoder(
        dataclasses.replace(cfg, attn_impl="fused", attn_dropout=0.0), seed=0)
    ids, mask = batches[0]
    mask = mask.at[:, 100:].set(0)  # exercise real padding
    e_n = np.asarray(m_n.apply({"params": p_n}, ids, mask, True))
    e_f = np.asarray(m_f.apply({"params": p_f}, ids, mask, True))
    cos = float(np.mean(np.sum(e_n * e_f, axis=1)))
    print(f"fused-vs-naive fwd mean cos (padded batch): {cos:.6f}",
          flush=True)
    assert cos > 0.999, "fused attention diverged from the naive path"


if __name__ == "__main__":
    main()
