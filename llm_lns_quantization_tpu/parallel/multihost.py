"""Multi-host evaluation: initialization + per-host request sharding.

The reference has no multi-host story at all (SURVEY.md §2.4); its scaling
mechanism is accelerate's layer offload. The TPU-native design: every host
runs the same program, ``jax.distributed.initialize`` wires the pod, model
shards span hosts via the ("data", "model") mesh over ICI/DCN, and the
request stream is partitioned host-cyclically with results gathered back to
every host so the evaluator stays host-count-agnostic (pure request lists
in, results out — SURVEY.md §7 design note).

Executed for real (not just wired) by
tests/test_parallel.py::test_two_process_distributed_eval_matches_single:
two OS processes join a gloo CPU process group via
``jax.distributed.initialize`` (tests/multihost_worker.py), run the same
full eval through ``simple_evaluate`` — which auto-wraps the engine in
``MultihostLM`` — and both must emit results equal to each other and to a
single-process oracle. The mesh/collective model path is separately
validated on the virtual CPU mesh and by __graft_entry__.dryrun_multichip.
"""

from typing import List, Optional

import jax


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed for a pod slice. Returns process count."""
    if jax.process_count() > 1:
        return jax.process_count()  # already initialized by the launcher
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        # TPU pod slices auto-discover via the metadata server
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single host
    return jax.process_count()


def shard_requests(requests: List, process_id: Optional[int] = None,
                   process_count: Optional[int] = None) -> List:
    """Host-cyclic partition of a request list (stable across hosts)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    return requests[pid::n]


def gather_results(local_results: List, process_id: Optional[int] = None,
                   process_count: Optional[int] = None) -> List:
    """Merge host-cyclic partial results back into original request order.

    Each host contributes its slice; all hosts end up with the full list
    (needed because every host runs the same evaluator control flow).
    """
    n = jax.process_count() if process_count is None else process_count
    if n == 1:
        return local_results
    from jax.experimental import multihost_utils
    import numpy as np
    import pickle

    # serialize to fixed-width uint8 (process_allgather needs arrays)
    payload = pickle.dumps(local_results)
    sizes = multihost_utils.process_allgather(
        np.array([len(payload)], np.int64)
    ).reshape(-1)
    maxlen = int(sizes.max())
    buf = np.zeros((maxlen,), np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(buf)  # [n, maxlen]

    per_host = [
        pickle.loads(bytes(gathered[i, : int(sizes[i])].tobytes()))
        for i in range(n)
    ]
    total = sum(len(x) for x in per_host)
    merged: List = [None] * total
    for host, part in enumerate(per_host):
        merged[host::n] = part
    return merged


def run_sharded(fn, requests: List) -> List:
    """fn(local_requests) on this host's slice, results merged everywhere."""
    local = shard_requests(requests)
    return gather_results(fn(local))


class MultihostLM:
    """LM wrapper: each host scores only its host-cyclic request slice and
    the results are all-gathered, so every host returns the full list and
    the evaluator control flow stays host-count-agnostic (SURVEY.md §7).

    Sits OUTSIDE CachingLM: every host shards the same full request list
    coming from the evaluator. Per-host caches legitimately diverge mid-run
    (each host's ``add_partial`` writes only its local slice), so a miss
    list derived from a local cache must never be the thing that gets
    sharded — gather pairs results by position. Auto-applied by
    simple_evaluate when ``jax.process_count() > 1``; a single process makes
    it a pass-through.
    """

    def __init__(self, lm, process_id: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.lm = lm
        self._pid = process_id
        self._n = process_count

    def _sharded(self, method, requests):
        local = shard_requests(requests, self._pid, self._n)
        return gather_results(getattr(self.lm, method)(local), self._pid, self._n)

    def loglikelihood(self, requests):
        return self._sharded("loglikelihood", requests)

    def loglikelihood_rolling(self, requests):
        return self._sharded("loglikelihood_rolling", requests)

    def greedy_until(self, requests):
        return self._sharded("greedy_until", requests)

    def __getattr__(self, name):  # tokenizers, hooks, engine properties
        return getattr(self.lm, name)
