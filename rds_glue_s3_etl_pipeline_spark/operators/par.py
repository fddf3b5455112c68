"""Driver-thread overlap for independent sub-pipelines (optimization
guide §2.6: "Overlap independent jobs").

Composite gate queries (q167, q233, q234, q229, q166, ...) run two or
three INDEPENDENT full pipelines — each with its own internal actions
(Lloyd checkpoint rounds, CC convergence probes, parquet checkpoints)
— and then combine small result frames. Sequential execution serializes
every one of those driver round-trips and leaves the cluster idle in
each branch's scheduling gaps and stage tails. Spark's scheduler runs
jobs submitted from several driver threads concurrently (FIFO: later
jobs back-fill executors the earlier job's tail frees), so evaluating
the branches on a small thread pool overlaps their idle time without
changing a single plan: each branch builds exactly the DataFrame it
built before, and the combined result is byte-identical.

This matters at every scale, not just the bench: on a real cluster the
same gates leave executors idle during each branch's stragglers, and
the back-fill is the documented mitigation.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import TypeVar

T = TypeVar("T")

# Branches per gate are 2-3; a small cap keeps concurrent jobs from
# fighting for executor slots (guide: "2-3 jobs in flight is plenty").
_MAX_WORKERS = 3

# Worker-thread name prefix; session.released_blocks checks it (see
# run_concurrently).
PAR_THREAD_PREFIX = "rds-par"


def run_concurrently(*thunks: Callable[[], T], max_workers: int | None = None) -> list[T]:
    """Evaluate independent thunks on driver threads; return their
    results in argument order. Exceptions propagate (first failing
    branch raises on the caller thread).

    Each thunk must be independent of its siblings (no shared mutable
    state beyond thread-safe caches) — true for the gate branches,
    which only share the immutable input tables. Thunks typically run
    eager actions (checkpoints, convergence loops) and return a lazy
    result frame over the materialized state; the caller composes those
    frames on its own thread.
    """
    if len(thunks) <= 1:
        return [t() for t in thunks]
    try:  # propagate JVM-side thread locals (job group/description)
        from pyspark import inheritable_thread_target

        wrapped = [inheritable_thread_target(t) for t in thunks]
    except Exception:  # pragma: no cover - fallback for odd runtimes
        wrapped = list(thunks)
    with ThreadPoolExecutor(
        max_workers=min(max_workers or _MAX_WORKERS, len(thunks)),
        # The prefix is LOAD-BEARING: session.released_blocks detects it
        # and skips releasing inside a worker thread — a context exiting
        # on one branch would otherwise unpersist checkpoint blocks a
        # SIBLING branch created after the context opened (observed as
        # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND mid-query). Hygiene is
        # preserved by the caller's own main-thread context / the
        # bench's between-query sweep.
        thread_name_prefix=PAR_THREAD_PREFIX,
    ) as pool:
        futures = [pool.submit(w) for w in wrapped]
        return [f.result() for f in futures]
