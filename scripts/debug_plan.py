"""Compare on-TPU tile planning vs numpy reference on identical data."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N, D, NLIST, B, TQ, P = 100_000, 768, 512, 1024, 256, 32


def main():
    from cloudvectordb_tpu.index.ivf_band import BandIVFIndex

    @jax.jit
    def mk(key):
        kc, ka, kn, kq, kqn = jax.random.split(key, 5)
        centers = jax.random.normal(kc, (128, D), jnp.float32)
        centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)
        a = jax.random.randint(ka, (N,), 0, 128)
        db = centers[a] +  (0.3 / (D ** 0.5)) * jax.random.normal(kn, (N, D), jnp.float32)
        db /= jnp.linalg.norm(db, axis=1, keepdims=True)
        q = db[jax.random.randint(kq, (B,), 0, N)] + 0.05 * jax.random.normal(
            kqn, (B, D), jnp.float32)
        q /= jnp.linalg.norm(q, axis=1, keepdims=True)
        return db, q

    db_d, q_d = mk(jax.random.PRNGKey(0))
    idx = BandIVFIndex.build(db_d, nlist=NLIST, dtype="int8", kmeans_iters=8,
                             tile_n=1024, tile_q=TQ)
    st = idx._device_state()
    n_tiles = int(idx._payload.shape[0]) // idx.tile_n
    print(f"n_tiles={n_tiles}", flush=True)

    # --- device plan (same math as _tiles_plan_search) ---
    @jax.jit
    def plan(q, centroids, tile_window):
        coarse = jax.lax.dot_general(q, centroids, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        top1 = jnp.argmax(coarse, axis=1)
        order = jnp.argsort(top1)
        coarse_s = coarse[order]
        cw = coarse_s[:, tile_window]
        tile_score = jnp.max(cw, axis=-1)
        ts = tile_score.reshape(B // TQ, TQ, -1).max(axis=1)
        _, table = jax.lax.top_k(ts, P)
        return order, table, coarse

    order_d, table_d, coarse_d = plan(q_d, st["centroids"], st["tile_window"])
    order_d = jax.device_get(order_d)
    table_d = jax.device_get(table_d)
    coarse = jax.device_get(coarse_d)  # (B, nlist) f32 (bf16-matmul precision)
    tw = jax.device_get(st["tile_window"])

    # --- numpy reference from the SAME coarse scores ---
    top1 = coarse.argmax(1)
    order_np = np.argsort(top1, kind="stable")
    cs = coarse[order_np]
    tile_score = cs[:, tw].max(-1)
    ts = tile_score.reshape(B // TQ, TQ, -1).max(1)
    table_np = np.argsort(-ts, axis=1)[:, :P]

    # overlap per query tile
    for i in range(0, B // TQ, 3):
        o = len(set(table_d[i].tolist()) & set(table_np[i].tolist()))
        print(f"qt{i}: device∩numpy table overlap {o}/{P}", flush=True)
    # do the device order and numpy order agree on grouping?
    same_tile = np.mean(
        (top1[order_d].reshape(-1, TQ).std(axis=1) > 0)
    )
    print("device order groups by top1 (tiles with >1 distinct top1 expected):",
          f"{same_tile:.2f}", flush=True)

    # CRITICAL: does the numpy-planned table give good recall on chip?
    from cloudvectordb_tpu.ops.pallas_band import tiles_topk_pallas
    from cloudvectordb_tpu.ops.topk import tiled_topk
    from cloudvectordb_tpu.eval.recall import recall_at_k

    _, gt = tiled_topk(db_d, q_d, 10, tile=8192)
    gt = jax.device_get(gt)
    q_np = jax.device_get(q_d)
    q_sorted = q_np[order_np]
    qa = np.abs(q_sorted).max(1, keepdims=True) / 127.0
    q_i8 = np.clip(np.round(q_sorted / qa), -127, 127).astype(np.int8)
    v, rows = tiles_topk_pallas(
        st["payload"], jnp.asarray(q_i8), jnp.asarray(table_np.astype(np.int32)),
        10, tile_n=1024, tile_q=TQ, int8=True,
    )
    gids = jax.device_get(st["ids"][jnp.clip(rows, 0, st["ids"].shape[0] - 1)])
    out = np.empty_like(gids)
    out[order_np] = gids
    r = recall_at_k(out, gt)
    print(f"numpy-planned table, chip kernel: recall@10 = {r:.4f} at P={P}/{n_tiles}",
          flush=True)


if __name__ == "__main__":
    main()
