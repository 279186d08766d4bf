"""Overlapping independent job chains from the driver (guide §2.6).

Spark happily runs several jobs at once inside one application; actions
are only sequential because driver code calls them sequentially. The
release-gate compositions are the textbook case: each family gate
reduces to a tiny verdict frame through its own chain of jobs (scans,
shuffles, convergence loops), the chains are mutually independent, and
profiled serially the apex wall equals the SUM of the legs with most
cores idle (platform_release_gate at sf0.1: 13.8 s wall, 175 jobs,
~4 s of perfectly-parallel task time).

:func:`materialize_legs` builds and MATERIALIZES each leg in its own
driver thread, so one leg's straggler/loop tail back-fills executors
the other legs free (FIFO scheduler back-fill). Materialization is
``localCheckpoint()`` — eager, executor-local, and exactly right for
the 1-row/tiny verdict frames the gates produce (the frames are
reconstructed per run, so nothing survives across bench reps).

Results are unchanged: every leg computes exactly what it computes
standalone (deterministic per leg, no cross-leg data dependency), and
the caller assembles the returned materialized frames in declaration
order. Cross-leg SHARED cached subtrees (e.g. a gate-registered
persist) must be registered BEFORE calling this, so every thread's
action plans against the registered entry; concurrent materialization
of one cache coordinates through the block manager's per-block
get-or-compute.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame


def materialize_legs(
    *builders: "Callable[[], DataFrame]",
) -> "list[DataFrame]":
    """Build each leg and materialize it (localCheckpoint) in its own
    driver thread; return the materialized frames in argument order."""
    with ThreadPoolExecutor(max_workers=len(builders)) as pool:
        return list(pool.map(lambda build: build().localCheckpoint(), builders))
