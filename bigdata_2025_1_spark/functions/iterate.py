"""Iterative fixed-point helpers (optimization round 14).

The repo's three connected-components sites (``dedup_connected_components``,
``dbscan_roles_from_pairs``, ``hdbscan_lite_from_pairs``) all ran the same
min-label-propagation loop with TWO driver actions per round: an eager
frontier materialization (persist/localCheckpoint) and a convergence count
that re-joined the new frontier against the old. At bench scale the loops
are job-count-bound (each action costs a fixed scheduling round-trip; the
propagation itself is tiny), and at any scale the convergence join is a
whole extra pass over two label frames.

This helper fixes both:

- **Chunked convergence checks.** ``CC_CHUNK`` propagation rounds run
  lazily inside ONE job, then one materialization + one convergence
  check. Exactness: min-label propagation is MONOTONE (labels only ever
  decrease — ``least(label, min neighbor label)``), so "chunk start ==
  chunk end" holds iff every round in the chunk was the identity, i.e.
  the fixed point was already reached; and extra rounds past the fixed
  point are identities, so the converged labels are byte-identical to
  the per-round-checked loop's. The divergence bound is unchanged: the
  loop still gives up after ``max_rounds`` total propagation rounds.

- **Join-free convergence count.** The chunk-start label rides the
  frame as a ``label0`` column, so the check is a filter+count over the
  just-checkpointed blocks instead of a join of two label frames.

- **Lineage truncation.** Chunk boundaries ``localCheckpoint()``, so the
  logical plan stays O(chunk) deep regardless of how many rounds the
  graph's diameter needs (the dbscan site documented Catalyst analysis
  blowing up past iteration 4 without truncation).

At 100 TB the trade is explicit: each wasted post-fixed-point round
inside the last chunk is one extra co-keyed shuffle of the label frame,
so a deployment where rounds are expensive sets ``CC_CHUNK`` low (1 or
2); where the graph is shallow and wide, higher values amortize the
per-action overhead. The default 4 suits shallow dup/density clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CC_CHUNK = 1  # propagation rounds per materialization + convergence check
# — measured at sf0.1 (interleaved A/B): chunk=4 REGRESSED every site
# (dedup_connected_components 2.95 -> 7.79 s) because under AQE each
# shuffle inside the lazy chunk still materializes as its own stage
# job, so chunking saves almost no scheduling while the always-
# completed chunk wastes up to chunk-1 post-fixed-point propagation
# rounds (each one a join+agg over the edge frame). The join-free
# convergence check is the part that pays at every chunk size; the
# parameter stays for non-AQE deployments where a chunk really is one
# job.


def min_label_propagate(
    edges: DataFrame,
    labels0: DataFrame,
    *,
    max_rounds: int = 32,
    chunk: int = CC_CHUNK,
    reliable: bool = False,
    err: str = "min-label propagation did not converge",
) -> DataFrame:
    """Run min-label propagation to the fixed point and return the
    converged ``(v, label)`` frame.

    ``edges`` is the DIRECTED propagation edge list ``(a, b)`` (labels
    flow a -> b; pass both directions for an undirected graph);
    ``labels0`` the initial ``(v, label)`` assignment. Raises
    RuntimeError(err) when the round budget (``max_rounds`` plus one
    confirming grace chunk — see the loop comment) passes without
    reaching the fixed point (component diameter too large) — returning
    partial labels would silently split real clusters.

    Fault-tolerance trade (``reliable=``): the default
    ``localCheckpoint()`` stores each round's label blocks on the
    EXECUTORS and truncates lineage, so under executor loss at cluster
    scale the blocks are unrecoverable (no lineage to replay) and the
    whole job fails back to its last external snapshot — standard and
    acceptable for a nightly batch, but a long loop on preemptible
    executors should pass ``reliable=True`` to use plain
    ``checkpoint()`` (fault-tolerant, written to the directory the
    caller must first set via ``spark.sparkContext.setCheckpointDir``)
    at the cost of a filesystem write per chunk. Local default stays
    executor-local: same plan shape, no checkpoint dir needed."""
    labels = labels0
    rounds = 0
    # The per-round-checked loop converged as soon as ONE round was the
    # identity, so it needed diameter+1 rounds within max_rounds. The
    # chunked loop detects convergence only at chunk boundaries, so it
    # gets ONE confirming grace chunk past max_rounds — a graph whose
    # diameter is exactly max_rounds now converges (correct labels)
    # instead of raising; anything deeper still raises.
    while rounds < max_rounds + chunk:
        k = min(chunk, max_rounds + chunk - rounds)
        cur = labels.select("v", "label", F.col("label").alias("label0"))
        for _ in range(k):
            prop = (
                edges.join(cur.select("v", "label"), edges["a"] == F.col("v"))
                .groupBy(edges["b"].alias("v2"))
                .agg(F.min("label").alias("nlabel"))
            )
            cur = cur.join(prop, cur["v"] == F.col("v2"), "left").select(
                "v",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
                "label0",
            )
        # LAZY checkpoint (round 15): eager=False defers materialization
        # into the convergence count below, so each round costs ONE
        # driver action (compute + store blocks + count changes in the
        # same job) instead of two. The blocks are still stored when
        # the job computes the RDD; the next round reads them.
        cur = (
            cur.checkpoint(eager=False)
            if reliable
            else cur.localCheckpoint(eager=False)
        )
        changed = cur.filter(F.col("label") != F.col("label0")).count()
        labels = cur.select("v", "label")
        rounds += k
        if changed == 0:
            return labels
    raise RuntimeError(err)
