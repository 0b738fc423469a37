"""Text-in → results-out serving (r4, VERDICT item 7).

The reference's object is "the vectordb WITH the encoder"
(/root/reference/README.md:2): a query arrives as TEXT, so serving cost =
tokenize (host) + encoder forward (device) + index search (device). This
script measures the three legs separately and end-to-end at B ∈ {1, 64,
4096} on the config-#4-scale index (12.5M×768/chip residual-int8 tiles),
with the query-side encoder op point (L=32/48 truncation, bf16, batch
coalescing) stated explicitly.

Corpus vectors are the headline bench's device-generated unit vectors (the
encoder here is timing-representative, not trained on them — recall numbers
for this index family are the headline bench's; what this script measures
is the COST SPLIT of the serving pipeline, which is data-independent at a
fixed tile budget).

TPU-native shape: query embeddings never leave HBM — the encoder's output
feeds ``search_device`` directly; only the final (B, k) ids cross to the
host.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_text_serving.py

Env: N (12.5M), P (448), TQ (128), L (32).
"""

import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from cloudvectordb_tpu.data.tokenize import TextTokenizer
from cloudvectordb_tpu.index.ivf_band import BandIVFIndex
from cloudvectordb_tpu.models.encoder import Encoder, init_encoder
from cloudvectordb_tpu.utils.config import EncoderConfig

N = int(os.environ.get("N", 12_500_000))
P = int(os.environ.get("P", 448))
TQ = int(os.environ.get("TQ", 128))
L = int(os.environ.get("L", 32))
D, LATENT, NCENTERS, NLIST = 768, 32, 256, 4096
CHUNK = 500_000
K = 10


def rtt_of():
    trivial = jax.jit(lambda x: jnp.sum(x))
    small = jnp.ones((8, 128))
    float(trivial(small))
    t0 = time.perf_counter()
    for i in range(5):
        float(trivial(small + i))
    return (time.perf_counter() - t0) / 5


def main():
    kw, kc = jax.random.split(jax.random.PRNGKey(1000))
    w = jax.random.normal(kw, (LATENT, D), jnp.float32) / (LATENT ** 0.5)
    centers = jax.random.normal(kc, (NCENTERS, LATENT), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen(key, m):
        ka, kn = jax.random.split(key)
        a = jax.random.randint(ka, (m,), 0, NCENTERS)
        z = centers[a] + (0.3 / (LATENT ** 0.5)) * jax.random.normal(
            kn, (m, LATENT), jnp.float32)
        x = z @ w
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    t0 = time.time()
    idx = BandIVFIndex.build_device_streaming(
        lambda i: gen(jax.random.PRNGKey(i), CHUNK), N // CHUNK,
        nlist=NLIST, kmeans_iters=10, residual=True)
    print(f"index build {time.time()-t0:.1f}s n={idx.ntotal}", flush=True)

    # query-side encoder: MiniLM-L6-class (22M params) + 768-d projection,
    # bf16 activations, queries truncated to L tokens (serving op point)
    cfg = EncoderConfig(hidden_dim=384, num_layers=6, num_heads=12,
                        mlp_dim=1536, max_len=L, out_dim=D,
                        dropout=0.0, dtype="bfloat16")
    model, params = init_encoder(cfg, seed=0)
    tok = TextTokenizer.train(
        [f"synthetic passage about topic {i} with words" for i in range(512)],
        vocab_size=8192)
    texts = [f"query about topic {i % 500} and concept {i % 37}"
             for i in range(4096)]

    @jax.jit
    def encode_dev(p, ids, mask):
        return model.apply({"params": p}, ids, mask, True)

    rtt = rtt_of()
    print(f"relay rtt {rtt*1e3:.1f} ms", flush=True)
    n_tiles = int(idx._payload.shape[0]) // idx.tile_n
    report = {}
    for B in (1, 64, 4096):
        bt = texts[:B]
        ids_np, mask_np = tok.encode_batch(bt, L)
        tq = min(TQ, max(8, 1 << (B - 1).bit_length()))
        p_t = min(P, n_tiles)

        # (1) tokenize only (host)
        t0 = time.perf_counter()
        for _ in range(5):
            tok.encode_batch(bt, L)
        t_tok = (time.perf_counter() - t0) / 5

        # (2) encode only (device, fenced)
        ids_d, mask_d = jnp.asarray(ids_np), jnp.asarray(mask_np)
        emb = encode_dev(params, ids_d, mask_d)
        float(jnp.sum(emb))  # warm + fence
        reps = 8 if B <= 64 else 4
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for it in range(reps):
            acc = acc + jnp.sum(encode_dev(params, ids_d + 0 * it, mask_d))
        float(acc)
        t_enc = max((time.perf_counter() - t0 - rtt) / reps, 1e-9)

        # (3) search only (device queries, fenced)
        qd = emb
        v, _ = idx.search_device(qd, K, p_tiles=p_t, tile_q=tq)
        float(jnp.sum(v))  # warm + fence
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for it in range(reps):
            vv, _ = idx.search_device(qd + 1e-6 * (it + 1), K,
                                      p_tiles=p_t, tile_q=tq)
            acc = acc + jnp.sum(vv)
        float(acc)
        t_sea = max((time.perf_counter() - t0 - rtt) / reps, 1e-9)

        # (4) end-to-end: tokenize → encode → search_device → fetch ids
        def e2e(i):
            ii, mm = tok.encode_batch(bt, L)
            e = encode_dev(params, jnp.asarray(ii + 0 * i), jnp.asarray(mm))
            _, gids = idx.search_device(e, K, p_tiles=p_t, tile_q=tq)
            return np.asarray(gids)  # the fence: ids reach the host
        e2e(0)  # warm
        t0 = time.perf_counter()
        for it in range(reps):
            e2e(it)
        t_raw = (time.perf_counter() - t0) / reps
        rtt_bound = t_raw - rtt < 0.05 * t_raw
        t_e2e = t_raw if rtt_bound else t_raw - rtt
        report[B] = dict(tok_ms=t_tok * 1e3, enc_ms=t_enc * 1e3,
                         search_ms=t_sea * 1e3, e2e_ms=t_e2e * 1e3,
                         e2e_qps=B / t_e2e, rtt_bound=rtt_bound)
        e2e_txt = (f"e2e {t_e2e*1e3:7.2f} ms RTT-BOUND (dev relay; per-leg "
                   "device times are the signal)" if rtt_bound else
                   f"e2e {t_e2e*1e3:7.2f} ms  ({B/t_e2e:,.0f} q/s")
        print(f"B={B:5d} L={L} tq={tq:4d} p={p_t}: tokenize {t_tok*1e3:7.2f} ms  "
              f"encode {t_enc*1e3:7.2f} ms  search {t_sea*1e3:7.2f} ms  "
              f"{e2e_txt}; encode share "
              f"{t_enc/(t_enc+t_sea)*100:.0f}% of device work)", flush=True)


if __name__ == "__main__":
    main()
