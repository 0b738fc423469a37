"""Encoder-REAL-geometry validation (r3 VERDICT item 4).

Every at-scale r2 number used the same synthetic Gaussian generator (32-d
latent, 256 soft clusters). Real transformer output has different intrinsic
dimension and anisotropy, so this script re-validates the index stack on
embeddings PRODUCED BY THE ENCODER end-to-end, offline:

  1. generate ~2M distinct synthetic-text passages (8 topics × high-entropy
     entity/number tokens — no two passages alike),
  2. train a WordPiece tokenizer + the MiniLM-L6-class encoder (contrastive,
     ICT-span triplets mined from the corpus — the real pipeline stages),
  3. encode all passages on-chip (streaming, device-resident chunks),
  4. build the residual-int8 tiles index (384-d) on those embeddings,
     auto-tune the op point (Index.tune), report recall@10 vs exact GT for
     ICT-style truncated-passage queries + fenced QPS,
  5. config-#2 shape: IVF-Flat nlist sweep on a 200k host subset.

Also prints geometry diagnostics (mean pairwise cosine, participation-ratio
intrinsic dimension) next to the Gaussian generator's, so op-point transfer
is interpretable. Usage: bench_encoder_real.py [n_passages_M=2] [steps=1500]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

TOPICS = [
    ("astronomy", "telescope galaxy orbit nebula supernova planet quasar "
     "asteroid spectrum redshift".split()),
    ("cooking", "recipe oven saute flavor ingredient simmer braise whisk "
     "marinade glaze".split()),
    ("finance", "market equity dividend portfolio interest bond futures "
     "hedge yield liquidity".split()),
    ("biology", "cell protein genome enzyme membrane organism mitosis "
     "receptor plasmid ribosome".split()),
    ("music", "melody rhythm chord orchestra tempo harmony cadence "
     "counterpoint timbre sonata".split()),
    ("sports", "tournament goal athlete league stadium coach playoff "
     "sprint defense referee".split()),
    ("computing", "compiler kernel network algorithm memory cache thread "
     "scheduler register pipeline".split()),
    ("geography", "river mountain climate desert coast valley plateau "
     "glacier estuary basin".split()),
]


def gen_passages(n: int, seed: int = 0) -> tuple[list[str], list[int]]:
    """High-entropy topical passages: topic words carry the semantics
    (retrieval signal), entity/number tokens make every passage distinct."""
    rng = np.random.default_rng(seed)
    t_idx = rng.integers(0, len(TOPICS), n)
    w_idx = rng.integers(0, 10, (n, 6))
    ents = rng.integers(0, 100_000, (n, 2))
    out = []
    for i in range(n):
        tname, words = TOPICS[t_idx[i]]
        w = [words[j] for j in w_idx[i]]
        out.append(
            f"report {ents[i,0]} on {tname}: the {w[0]} and the {w[1]} "
            f"shape the {w[2]} near {w[3]} while {w[4]} entry {ents[i,1]} "
            f"records the {w[5]}"
        )
    return out, t_idx.tolist()


def geometry_stats(emb: np.ndarray) -> tuple[float, float]:
    """(mean pairwise cosine, participation-ratio intrinsic dim)."""
    x = emb[:4096].astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cos = float((x @ x.T).mean())
    xc = x - x.mean(0)
    ev = np.linalg.eigvalsh(xc.T @ xc / x.shape[0])
    pr = float(ev.sum() ** 2 / (ev ** 2).sum())
    return cos, pr


def main():
    from cloudvectordb_tpu.data.tokenize import TextTokenizer
    from cloudvectordb_tpu.data.triplets import mine_triplets, triplet_batches
    from cloudvectordb_tpu.eval.recall import recall_at_k
    from cloudvectordb_tpu.eval.sweep import nprobe_sweep
    from cloudvectordb_tpu.index.ivf_band import BandIVFIndex
    from cloudvectordb_tpu.index.ivf_flat import IVFFlatIndex
    from cloudvectordb_tpu.models.embed import encode_corpus_streaming
    from cloudvectordb_tpu.models.encoder import Encoder
    from cloudvectordb_tpu.ops.topk import tiled_topk
    from cloudvectordb_tpu.train.trainer import Trainer
    from cloudvectordb_tpu.utils.config import (EncoderConfig, MiningConfig,
                                                TrainConfig)

    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    n = int(n_m * 1e6)
    max_len = 48
    t0 = time.perf_counter()
    passages, doc_ids = gen_passages(n, seed=11)
    print(f"[corpus] {n} passages in {time.perf_counter()-t0:.0f} s",
          flush=True)

    t0 = time.perf_counter()
    tok = TextTokenizer.train(passages[:100_000], vocab_size=8192,
                              max_len=max_len)
    print(f"[tokenizer] vocab {tok.vocab_size} in "
          f"{time.perf_counter()-t0:.0f} s", flush=True)

    # -- train the encoder on ICT-span triplets (the real pipeline path) ----
    mcfg = MiningConfig(strategy="inbatch", num_triplets=60_000, seed=3)
    trip = mine_triplets(passages[:400_000], doc_ids[:400_000], mcfg)
    ecfg = EncoderConfig(vocab_size=max(tok.vocab_size, 8), max_len=max_len)
    # uniformity term (Wang–Isola, train/losses.py): without it this tiny
    # from-scratch encoder collapses to a cone (r5 measured: mean-cos 0.994,
    # intrinsic dim 4.6 at 1500 steps) whose neighbor gaps (~2e-6 IP) sit
    # below ANY 8-bit payload's quantization step — the anti-collapse
    # penalty is what makes the output geometry indexable at all
    unif = float(os.environ.get("UNIF", "1.0"))
    tcfg = TrainConfig(encoder=ecfg, batch_size=256, total_steps=steps,
                       lr=5e-4, warmup_steps=100, ckpt_every=10 ** 9,
                       uniformity_weight=unif,
                       ckpt_dir="/tmp/enc_real_ckpt")
    trainer = Trainer(tcfg)
    t0 = time.perf_counter()
    state = trainer.fit(triplet_batches(trip, tok, tcfg.batch_size, max_len,
                                        seed=0), resume=False)
    params = state.params  # stay device-resident: a numpy pytree would
    # re-ship ~90 MB of params per encode batch through the relay (the
    # r2–r4 OOM + 280x slowdown — make_encode_fn doc)
    print(f"[train] {steps} steps (B={tcfg.batch_size}, L={max_len}) in "
          f"{time.perf_counter()-t0:.0f} s", flush=True)

    # -- encode the full corpus on-chip, embeddings stay device-resident ----
    model = Encoder(ecfg)
    chunk_rows = 250_000
    chunks: list = []
    blocks: list = []
    host_head: list[np.ndarray] = []  # first 200k rows for the IVF-Flat leg
    host_rows = 0

    def consume(block):
        nonlocal host_rows
        blocks.append(block)
        if host_rows < 200_000:
            host_head.append(np.asarray(block))
            host_rows += block.shape[0]
        if sum(b.shape[0] for b in blocks) >= chunk_rows:
            chunks.append(jnp.concatenate(blocks))
            blocks.clear()

    t0 = time.perf_counter()
    total = encode_corpus_streaming(model, params, tok, passages, consume,
                                    batch_size=512, max_len=max_len)
    if blocks:
        chunks.append(jnp.concatenate(blocks))
        blocks.clear()
    enc_s = time.perf_counter() - t0
    print(f"[encode] {total} passages in {enc_s:.0f} s "
          f"({total/enc_s:,.0f}/s/chip incl. host tokenize)", flush=True)

    cos, pr = geometry_stats(np.asarray(chunks[0][:4096]))
    print(f"[geometry] mean-cos {cos:.3f}, participation-ratio intrinsic "
          f"dim {pr:.1f} (Gaussian generator: ~0.00, ~32)", flush=True)

    # -- ICT-style queries: truncated passages, exact GT over all chunks ----
    B, NQ_GT, K = 4096, 512, 10
    rng = np.random.default_rng(99)
    q_src = rng.integers(0, n, B)
    q_text = [" ".join(passages[i].split()[:7]) for i in q_src]
    q_emb = []
    encode_corpus_streaming(model, params, tok, q_text,
                            lambda b: q_emb.append(np.asarray(b)),
                            batch_size=512, max_len=max_len)
    q = jnp.asarray(np.concatenate(q_emb))

    best_v = jnp.full((NQ_GT, K), -jnp.inf)
    best_i = jnp.zeros((NQ_GT, K), jnp.int32)

    @jax.jit
    def gt_merge(bv, bi, cv, ci, base_row):
        av = jnp.concatenate([bv, cv], axis=1)
        ai = jnp.concatenate([bi, ci + base_row], axis=1)
        v, p = jax.lax.top_k(av, K)
        return v, jnp.take_along_axis(ai, p, axis=1)

    t0 = time.perf_counter()
    base_row = 0
    for ch in chunks:
        cv, ci = tiled_topk(ch, q[:NQ_GT], K, tile=8192)
        best_v, best_i = gt_merge(best_v, best_i, cv, ci, base_row)
        base_row += ch.shape[0]
    gt = jax.device_get(best_i)
    gv = jax.device_get(best_v)
    # neighbor-gap diagnostic: any payload whose per-row score noise
    # exceeds these gaps cannot resolve the ranking (r5 collapse finding)
    print(f"[gt] {time.perf_counter()-t0:.0f} s; IP gaps: top1-top2 "
          f"median {np.median(gv[:, 0] - gv[:, 1]):.2e}, top9-top10 "
          f"{np.median(gv[:, -2] - gv[:, -1]):.2e}", flush=True)

    # -- residual-int8 tiles index on encoder output ------------------------
    t0 = time.perf_counter()
    idx = BandIVFIndex.build_device_streaming(
        lambda i: chunks[i], len(chunks), nlist=4096, kmeans_iters=10,
        residual=True,
    )
    print(f"[build] tiles index in {time.perf_counter()-t0:.0f} s",
          flush=True)
    q_np = np.asarray(q)
    report = idx.tune(q_np, k=K, target_recall=0.95, verbose=True)
    _, found = idx.search(q_np, K)
    r_abs = recall_at_k(found[:NQ_GT], gt)
    print(f"[tiles] tuned op {report['op']} (self-relative "
          f"{report['recall']:.4f}, met={report['met']}): ABSOLUTE "
          f"recall@10={r_abs:.4f}  {report['qps']:,.0f} qps/chip"
          f"{' (rtt-bound)' if report['rtt_bound'] else ''}", flush=True)

    # -- config-#2 shape: IVF-Flat on a 200k host subset --------------------
    sub = np.concatenate(host_head)[:200_000]
    flat_q = q_np[:NQ_GT]
    t0 = time.perf_counter()
    ivf = IVFFlatIndex.build(sub, nlist=1024, kmeans_iters=8, seed=0)
    print(f"[ivf_flat] 200k build {time.perf_counter()-t0:.0f} s", flush=True)
    for row in nprobe_sweep(ivf, sub, flat_q, k=K,
                            nprobes=(4, 16, 64, 256)):
        print(f"[ivf_flat] nprobe={row['nprobe']:4d}: "
              f"recall@10={row['recall']:.4f}  {row['qps']:8.0f} qps",
              flush=True)


if __name__ == "__main__":
    main()
