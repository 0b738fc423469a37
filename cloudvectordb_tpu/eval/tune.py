"""Op-point auto-tuner (SURVEY.md §7.1 M8; round-3 VERDICT item 5).

``Index.tune(queries, target_recall)`` replaces hand-carried env knobs
(p_tiles / tile_q / k_cand / n_pools / nprobe): each index family supplies a
cost-ordered candidate ladder (``Index._tune_candidates``) and a max-effort
reference config (``Index._tune_reference_kw``); the engine here walks the
ladder cheapest-first, measures recall@k of each candidate against the
reference (or a caller-supplied exact ground truth), stops at the first
config meeting the target, and times that config honestly (distinct inputs
per rep, relay RTT subtracted — eval/qps.py rules). The chosen op point is
stored on the index (``_op_point``) where ``search()`` picks it up for any
knob the caller leaves at its sentinel default, and persisted in the
artifact manifest so a loaded index serves tuned out of the box.

Recall semantics: with ``gt=None`` the reference is the index's OWN
max-effort configuration, so recall is relative to the index's ceiling
(quantizer loss excluded) — the right objective for knob tuning. Pass an
exact ``gt`` (brute-force ids) to tune against absolute recall instead.
"""

from __future__ import annotations

import time

import numpy as np

from cloudvectordb_tpu.eval.recall import recall_at_k


class TunableMixin:
    """``tune()`` + tuned-op-point storage, shared by single indexes
    (index/base.py) and the sharded wrappers (parallel/dist_*.py) so the
    tune contract lives in exactly one place. Subclasses supply
    ``_tune_candidates(nq)`` (cost-ordered ladder of search() kwargs) and
    ``_tune_reference_kw(nq)`` (max-effort config)."""

    #: tuned serving knobs — search() uses these for any parameter the
    #: caller leaves at its sentinel default; persisted in the manifest
    _op_point: dict | None = None

    def _tune_candidates(self, nq: int) -> list[dict]:
        raise NotImplementedError(
            f"{type(self).__name__} does not support tune()")

    def _tune_reference_kw(self, nq: int) -> dict:
        raise NotImplementedError

    def tune(self, queries, k: int = 10, target_recall: float = 0.95,
             gt: np.ndarray | None = None, time_iters: int = 3,
             verbose: bool = False) -> dict:
        """Pick the cheapest serving config meeting ``target_recall`` on
        ``queries`` and make it this index's default op point (also saved
        in the manifest). Returns the tune report — see tune_index."""
        report = tune_index(self, queries, k, target_recall, gt,
                            time_iters=time_iters, verbose=verbose)
        self._op_point = report["op"]
        return report


def _time_search(index, queries, k: int, kw: dict, iters: int = 3) -> dict:
    """Honest wall-clock of index.search: numpy outputs fence every call;
    distinct inputs per rep defeat the relay's result cache; RTT subtracted
    unless it dominates (then the raw rate is reported as a lower bound)."""
    from cloudvectordb_tpu.eval.qps import measure_fetch_rtt

    rtt = measure_fetch_rtt()
    t0 = time.perf_counter()
    for it in range(iters):
        index.search(np.roll(queries, it + 1, axis=0), k, **kw)
    raw = (time.perf_counter() - t0) / iters
    rtt_bound = raw - rtt < 0.05 * raw
    dt = raw if rtt_bound else raw - rtt
    return {
        "qps": queries.shape[0] / dt,
        "qps_raw": queries.shape[0] / raw,
        "rtt_bound": bool(rtt_bound),
        "latency_ms": 1000.0 * dt,
    }


def tune_index(
    index,
    queries,
    k: int = 10,
    target_recall: float = 0.95,
    gt: np.ndarray | None = None,
    time_iters: int = 3,
    verbose: bool = False,
) -> dict:
    """Walk the index's candidate ladder; return the chosen op point.

    Returns ``{"op": dict, "recall": float, "met": bool, "qps": float,
    "qps_raw": float, "rtt_bound": bool, "latency_ms": float,
    "tried": [...]}. ``met=False`` means no candidate reached the target
    and ``op`` is the best-recall candidate instead (its recall is
    reported). The ladder is cost-ordered, so the first hit is the
    cheapest serving config at the target."""
    queries = np.asarray(queries, np.float32)
    nq = queries.shape[0]
    candidates = index._tune_candidates(nq)
    assert candidates, "index supplied an empty tune ladder"
    if gt is None:
        # the max-effort reference is the deepest-coverage config of all —
        # exactly the class that can exceed VMEM / the SMEM prefetch-table
        # cap at scale. Fall back down the ladder (most expensive first)
        # so one failed compile degrades the reference instead of
        # aborting the whole tune.
        ref_err = None
        for ref_kw in [index._tune_reference_kw(nq)] + candidates[::-1]:
            try:
                _, gt = index.search(queries, k, **ref_kw)
                break
            except Exception as e:  # noqa: BLE001 — see ladder except below
                ref_err = e
                if verbose:
                    print(f"[tune] reference {ref_kw}: FAILED "
                          f"{type(e).__name__}", flush=True)
        if gt is None:
            raise RuntimeError(
                f"no reference config compiled; last error: {ref_err}")
    tried = []
    best = None  # (recall, cfg) fallback when nothing meets target
    chosen = None
    for cfg in candidates:
        try:
            _, found = index.search(queries, k, **cfg)
        except Exception as e:  # noqa: BLE001 — a single config must not
            # abort the ladder: deep-pool/large-p combos can exceed VMEM or
            # the SMEM prefetch-table cap (remote-compile HTTP 500) at scale
            tried.append({**cfg, "error": f"{type(e).__name__}: {e}"[:160]})
            if verbose:
                print(f"[tune] {cfg}: FAILED {type(e).__name__}", flush=True)
            continue
        r = float(recall_at_k(found, gt))
        tried.append({**cfg, "recall": r})
        if verbose:
            print(f"[tune] {cfg}: recall@{k}={r:.4f}", flush=True)
        if best is None or r > best[0]:
            best = (r, cfg)
        if r >= target_recall:
            chosen = (r, cfg)
            break
    met = chosen is not None
    if best is None:
        raise RuntimeError(f"every tune candidate failed: {tried}")
    recall, op = chosen if met else best
    timing = _time_search(index, queries, k, op, iters=time_iters)
    return {"op": dict(op), "recall": recall, "met": met, **timing,
            "tried": tried}
