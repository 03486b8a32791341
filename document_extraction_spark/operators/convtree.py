"""Branched-conversation tree paths: agent/assistant transcripts branch
(retries, edits, tool-call forks), so a conversation is a TREE of turns
with parent pointers; training and eval want the LINEAR histories — every
root-to-leaf path in stable order.

This generalizes the reference's strictly-linear per-document page walk
(/root/reference/src/pdf_extractor/extractor.py processes one PDF's pages
in order) to the tree-shaped transcript corpora the engine targets.

Distributed shape — pointer DOUBLING, not per-edge recursion: each node
carries (ptr, chain) where ``chain`` is the resolved id segment from just
below ``ptr`` down to the node itself.  One equi-join per round against the
same evolving frame substitutes the ptr's own (ptr, chain), so the resolved
segment doubles every round: ceil(log2(depth)) shuffles TOTAL, each keyed
(conv_id, node_id) — a 10^12-turn corpus with depth <= 1024 conversations
needs 10 rounds, not 1024 (the recursive-CTE cost).  Lineage is cut with
localCheckpoint per round (the operators/dedup.py CC recipe); convergence
is a one-row aggregate per round (bounded driver traffic).

Leaves are found with one LEFT ANTI join (nodes never referenced as a
parent).  Output is integer/string-exact — the DuckDB twin is a recursive
CTE from each leaf up to its root, and every path string hash-verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 40  # depth ceiling 2^40 — loudly beyond any real transcript


def conv_root_paths(
    turns: DataFrame,
    conv_col: str = "conv_id",
    id_col: str = "node_id",
    parent_col: str = "parent_id",
    max_rounds: int = MAX_ROUNDS,
) -> DataFrame:
    """(conv_id, leaf_id, depth, path) — one row per leaf turn; ``path`` is
    the root-to-leaf id chain joined with '>', ``depth`` its node count.

    Cycles (corrupt parent pointers) would never converge; after
    ``max_rounds`` the loop raises rather than spinning.
    """
    # id-typed casts derived from the input schema (ADVICE r6: the empty
    # chain / null ptr literals were hardcoded long, breaking non-long ids)
    from pyspark.sql import types as _T

    id_dt = turns.schema[id_col].dataType
    null_ptr = F.lit(None).cast(id_dt)
    empty_chain = F.array().cast(_T.ArrayType(id_dt))
    leaves = turns.join(
        turns.select(
            F.col(conv_col).alias("_c"), F.col(parent_col).alias("_p")
        ).where(F.col("_p").isNotNull()),
        (F.col(conv_col) == F.col("_c")) & (F.col(id_col) == F.col("_p")),
        "left_anti",
    )
    state = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.col(id_col).alias("node_id"),
        F.col(parent_col).alias("ptr"),
        F.array(F.col(id_col)).alias("chain"),
    ).localCheckpoint(eager=True)

    for _ in range(max_rounds):
        anc = state.select(
            F.col("conv_id").alias("_ac"),
            F.col("node_id").alias("_an"),
            F.col("ptr").alias("_aptr"),
            F.col("chain").alias("_achain"),
        )
        # r7: ONE scheduler job per round — the convergence count runs over
        # the round's non-eager checkpoint, materializing its blocks as it
        # counts (the dedup_clusters CC recipe); the old shape paid a
        # separate probe job per round, and per-round job overhead WAS most
        # of the cost on log2(depth) rounds of a small frame.  A round over
        # an already-converged state is the identity (every ptr NULL takes
        # the no-op branch), so join-then-check stops at the same fixpoint
        # check-then-join did.
        state = (
            state.join(
                anc,
                (F.col("conv_id") == F.col("_ac"))
                & (F.col("ptr") == F.col("_an")),
                "left",
            )
            .select(
                "conv_id",
                "node_id",
                F.when(F.col("ptr").isNull(), null_ptr)
                .otherwise(F.col("_aptr"))
                .alias("ptr"),
                F.when(F.col("ptr").isNull(), F.col("chain"))
                # coalesce: a DANGLING parent (no such node) resolves like a
                # root rather than nulling the whole chain
                .otherwise(
                    F.concat(
                        F.coalesce(F.col("_achain"), empty_chain),
                        F.col("chain"),
                    )
                )
                .alias("chain"),
            )
            .localCheckpoint(eager=False)
        )
        remaining = state.agg(F.count("ptr").alias("n")).collect()[0]["n"]
        if remaining == 0:
            break
    else:
        raise RuntimeError(
            f"conv_root_paths did not converge in {max_rounds} rounds — "
            "cyclic parent pointers?"
        )

    return (
        state.join(
            leaves.select(
                F.col(conv_col).alias("conv_id"),
                F.col(id_col).alias("node_id"),
            ),
            ["conv_id", "node_id"],
            "left_semi",
        )
        .select(
            "conv_id",
            F.col("node_id").alias("leaf_id"),
            F.size("chain").cast("long").alias("depth"),
            F.array_join(F.col("chain"), ">").alias("path"),
        )
    )
