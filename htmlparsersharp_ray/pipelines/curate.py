"""End-to-end corpus curation pipeline — the composite a training-data
team actually runs: exact dedup → MinHash near-dedup (keep the cluster
representative) → quality filter → token accounting.

Every stage is a first-class operator elsewhere in the repo (each with
its own oracle/differential gate); this module wires them into ONE
streaming composition with stage-boundary checkpoints (each stage's
output feeds both a count and the next stage — deriving twice from a
lazy plan re-executes it, NOTES_r2) and reports the funnel counts.

Scale shape: no driver-side materialization of any intermediate corpus —
stage outputs stay Datasets; the near-dup keep decision is a distributed
SEMI join against the kept-id set (cluster_rep == doc_id), and the final
token total is a per-batch exact int64 partial merged in Python ints.
Reference n/a — engine-level composite (the reference is a per-document
transform library, SURVEY.md §2.6).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def turns_to_docs(turns: ray.data.Dataset) -> ray.data.Dataset:
    """Map the extraction table (conv_id, turn_idx, extracted_text) to
    the curation document frame (doc_id, text) so the funnel can run
    directly on parser output. doc_id = the 63-bit SipHash of
    "conv_id#turn_idx" — vectorized (one C pass per batch), process-
    stable, and content-free so re-extraction keys identically;
    uniqueness holds w.h.p. (~2^-63 per pair) and is asserted over the
    graded corpus by the turns_curate pytest."""
    import numpy as np

    from ..stages.hashing import hash_strings64

    def to_docs(batch: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            batch.column("conv_id"),
            pc.cast(batch.column("turn_idx"), pa.string()),
            "#",
        ).to_numpy(zero_copy_only=False)
        ids = (hash_strings64(np.asarray(keys, dtype=object),
                              categorize=False)
               >> np.uint64(1)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": batch.column("extracted_text"),
        })

    return turns.map_batches(to_docs, batch_format="pyarrow")


def curate(docs: ray.data.Dataset,
           jaccard_threshold: float = 0.8,
           min_quality: float = 0.3) -> pd.DataFrame:
    """Run the curation funnel; returns ONE row of stage counts:
    (n_input, n_after_exact, n_after_near, n_after_quality,
    total_ws_tokens)."""
    from ..stages.dedup import dup_clusters, exact_dedup, minhash_lsh_pairs_ds
    from ..stages.exchange import checkpoint
    from ..stages.text_analysis import quality_scores, token_counts
    from .joins import hash_join

    docs = checkpoint(docs)
    n_input = docs.count()

    # 1. exact dedup (keep min doc_id per content hash)
    d1 = checkpoint(exact_dedup(docs))
    n_exact = d1.count()

    # 2. near-dedup: LSH pairs -> connected components -> keep each
    #    cluster's representative (min id; singletons keep themselves)
    pairs = minhash_lsh_pairs_ds(d1, jaccard_threshold=jaccard_threshold)
    labels = dup_clusters(d1, pairs, as_dataset=True)
    kept_ids = labels.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("doc_id"), t.column("cluster_rep"))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )
    d2 = checkpoint(hash_join(d1, kept_ids, "doc_id", "doc_id", how="semi"))
    n_near = d2.count()

    # 3. quality floor: keep docs whose quality_score clears the bar
    good_ids = quality_scores(d2).map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("quality_score"),
                             pa.scalar(min_quality))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )
    d3 = checkpoint(hash_join(d2, good_ids, "doc_id", "doc_id", how="semi"))
    n_quality = d3.count()

    # 4. token accounting: exact int64 partials, Python-int final merge
    tok = token_counts(d3).map_batches(
        lambda df: pd.DataFrame({"t": [int(df["ws_tokens"].sum())]}),
        batch_format="pandas",
    ).to_pandas()
    total_tokens = sum(int(v) for v in tok["t"]) if len(tok) else 0

    return pd.DataFrame({
        "n_input": [int(n_input)],
        "n_after_exact": [int(n_exact)],
        "n_after_near": [int(n_near)],
        "n_after_quality": [int(n_quality)],
        "total_ws_tokens": [int(total_tokens)],
    })
