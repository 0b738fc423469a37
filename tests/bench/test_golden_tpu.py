"""Golden-number perf checks (SURVEY.md §4.2, non-CI-blocking).

Skipped off-TPU: the CPU conftest pins the cpu backend, so these only run
when invoked with the real chip (JAX_GOLDEN_TPU=1 python -m pytest tests/bench
from an environment whose default backend is the TPU).
"""

import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("JAX_GOLDEN_TPU") != "1" or jax.default_backend() == "cpu",
    reason="golden perf checks need the real TPU (set JAX_GOLDEN_TPU=1)",
)

N, D, K, B = 500_000, 768, 10, 1024


@pytest.fixture(scope="module")
def data():
    @jax.jit
    def mk(key):
        kc, ka, kn, kq = jax.random.split(key, 4)
        centers = jax.random.normal(kc, (128, D), jnp.float32)
        centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)
        a = jax.random.randint(ka, (N,), 0, 128)
        db = centers[a] +  (0.3 / (D ** 0.5)) * jax.random.normal(kn, (N, D), jnp.float32)
        db /= jnp.linalg.norm(db, axis=1, keepdims=True)
        q = db[jax.random.randint(kq, (B,), 0, N)]
        return db, q

    return mk(jax.random.PRNGKey(0))


def test_int8_scan_golden_qps(data):
    from cloudvectordb_tpu.ops.pallas_topk import flat_topk_pallas_int8
    from cloudvectordb_tpu.eval.qps import measure_fetch_rtt

    db, q = data
    dbf = db.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(dbf * dbf))
    s = float(jnp.minimum(jnp.max(jnp.abs(dbf)), 4 * rms) / 127.0)
    db_i8 = jnp.clip(jnp.round(dbf / s), -127, 127).astype(jnp.int8)
    rtt = measure_fetch_rtt()

    def run(noise):
        v, _ = flat_topk_pallas_int8(db_i8, s, q.astype(jnp.float32) + noise, K)
        return float(jnp.sum(v))

    run(0.0)
    t0 = time.perf_counter()
    iters = 4
    for i in range(iters):
        run(1e-4 * (i + 1))
    dt = max(time.perf_counter() - t0 - rtt * iters, 1e-9)
    qps = B * iters / dt
    # golden floor: half the measured 1M number scaled to 500k (generous)
    assert qps > 40_000, f"int8 scan regressed: {qps:.0f} qps at {N}x{D}"


def test_flat_recall_golden(data):
    """Two calibrated claims (the clustered fixture is tie-dense: ~390
    rows/cluster whose score spread sits at the bf16 rounding step, so an
    f32 oracle is only a fair reference for the f32-exact kernel mode):

    1. precision='highest' vs the exact f32 oracle — loses only the bucket
       collision term (≈(K-1)/2L ≈ 0.2%).
    2. default (MXU-bf16) vs a bf16-consistent oracle (exact top-k of the
       bf16-rounded problem) — same bound, plus q-side rounding noise.
    """
    from cloudvectordb_tpu.ops.pallas_topk import flat_topk_pallas
    from cloudvectordb_tpu.ops.topk import tiled_topk
    from cloudvectordb_tpu.eval.recall import recall_at_k

    db, q = data
    sub = q[:128]
    _, gt = tiled_topk(db, sub, K, tile=8192)
    _, found_hi = flat_topk_pallas(db, sub, K, precision="highest")
    r_hi = recall_at_k(np.asarray(found_hi), np.asarray(gt))
    assert r_hi >= 0.99, f"f32-exact kernel mode regressed: {r_hi}"

    db16 = db.astype(jnp.bfloat16)
    _, gt16 = tiled_topk(db16.astype(jnp.float32), sub, K, tile=8192)
    _, found = flat_topk_pallas(db16, sub.astype(jnp.bfloat16), K)
    r = recall_at_k(np.asarray(found), np.asarray(gt16))
    assert r >= 0.97, f"bf16 kernel vs bf16-consistent oracle: {r}"
