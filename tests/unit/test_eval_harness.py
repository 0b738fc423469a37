"""nprobe sweep + operating point + qps_bench (CPU)."""


from cloudvectordb_tpu.data.synthetic import clustered_vectors, queries_from
from cloudvectordb_tpu.eval.qps import qps_bench
from cloudvectordb_tpu.eval.sweep import nprobe_sweep, operating_point
from cloudvectordb_tpu.index import IVFFlatIndex


def test_sweep_monotone_and_operating_point():
    db = clustered_vectors(2000, 24, n_clusters=16, seed=100)
    q = queries_from(db, 16, seed=101)
    idx = IVFFlatIndex.build(db, nlist=16, metric="ip", kmeans_iters=6)
    rows = nprobe_sweep(idx, db, q, k=5, nprobes=(1, 4, 16), time_iters=1)
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls) or max(recalls) - min(recalls) < 0.05
    assert rows[-1]["recall"] == 1.0  # nprobe=nlist ≡ exact
    op = operating_point(rows, min_recall=0.99)
    assert op is not None and op["recall"] >= 0.99
    assert all(r["qps"] > 0 for r in rows)


def test_qps_bench_runs():
    import jax.numpy as jnp

    from cloudvectordb_tpu.ops.topk import tiled_topk

    db = jnp.asarray(clustered_vectors(1000, 16, seed=102))
    q = clustered_vectors(64, 16, seed=103)
    out = qps_bench(
        lambda qb: tiled_topk(db, qb, 5, tile=512), jnp.asarray(q),
        batch=32, warmup=1, iters=2,
    )
    assert out["qps"] > 0 and out["batch"] == 32


def test_device_seconds_positive_and_scales():
    import jax
    import jax.numpy as jnp

    from cloudvectordb_tpu.eval.qps import device_seconds

    x = jnp.asarray(clustered_vectors(256, 64, seed=104))

    def step_small(i, xa):
        q = jax.lax.dynamic_slice_in_dim(xa, i % 128, 8)
        return jnp.sum(q @ xa.T)

    def step_big(i, xa):
        q = jax.lax.dynamic_slice_in_dim(xa, i % 64, 128)
        acc = jnp.float32(0)
        for _ in range(8):  # 128x the small step's FLOPs
            acc = acc + jnp.sum((q + acc) @ xa.T)
        return acc

    t_small = device_seconds(step_small, x, reps=32)
    t_big = device_seconds(step_big, x, reps=32)
    assert t_small > 0 and t_big > 0
    # loose: the 128x-FLOPs step must not measure FASTER than the small one
    # (timing on shared CI hosts is noisy; no tight ratio asserted)
    assert t_big >= t_small * 0.5
