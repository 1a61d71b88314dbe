"""Similarity search over the embeddings table (list<float> column).

Brute-force cosine top-k is the exact baseline: per batch, a numpy matmul
against a BROADCAST query matrix (ray.put once, fetched in actor
__init__), emitting per-batch partial top-k; a tiny groupby+sort merges
partials. The scale path is the LSH-bucketed variant: random-hyperplane
signatures bucket vectors so each query only scans its bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy()
    emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
    return ids, emb


class CosineTopK:
    """Actor stage: per-batch exact top-k against the broadcast queries."""

    def __init__(self, query_ref, k: int):
        q = ray.get(query_ref)  # dict: query_id -> np.ndarray
        self.query_ids = np.array(sorted(q))
        qm = np.stack([q[i] for i in self.query_ids]).astype(np.float64)
        self.qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, emb = _batch_matrix(batch)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        emb = emb / norms
        sims = emb @ self.qm.T  # (n_batch, n_query)
        k = min(self.k, len(ids))
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k]
            for t in top:
                out_q.append(int(self.query_ids[qi]))
                out_v.append(int(ids[t]))
                out_s.append(float(col[t]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def brute_force_topk(
    emb_ds: ray.data.Dataset, queries: dict[int, np.ndarray], k: int = 10
) -> pd.DataFrame:
    """Exact cosine top-k for each query vector. Result: one row per
    (query_id, rank) with deterministic tie-break on vec_id."""
    ref = ray.put(queries)
    partial = emb_ds.map_batches(
        CosineTopK,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 2),
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cosine", "vec_id"], ascending=[False, True]
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = partial.groupby("query_id").map_groups(merge, batch_format="pandas")
    return (
        out.to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


# --- LSH-bucketed ANN (the scale path) -------------------------------------
_N_PLANES = 12
_PLANE_RNG = np.random.default_rng(7)


def _planes(dim: int) -> np.ndarray:
    return _PLANE_RNG.standard_normal((_N_PLANES, dim)).astype(np.float32)


class LshBucketUDF:
    """Random-hyperplane signature per vector → bucket id."""

    def __init__(self, planes_ref):
        self.planes = ray.get(planes_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, emb = _batch_matrix(batch)
        bits = (emb @ self.planes.T) > 0  # (n, P)
        buckets = np.zeros(len(ids), dtype=np.int64)
        for p in range(self.planes.shape[0]):
            buckets |= bits[:, p].astype(np.int64) << p
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(buckets, pa.int64()),
                "embedding": batch.column("embedding"),
            }
        )


def lsh_topk(
    emb_ds: ray.data.Dataset, queries: dict[int, np.ndarray], k: int = 10
) -> pd.DataFrame:
    """Approximate top-k: each query scans only its own hyperplane bucket.
    Falls back to empty result rows when a bucket lacks k members — the
    documented approximation/recall trade-off of the scale path."""
    dim = len(next(iter(queries.values())))
    planes = _planes(dim)
    planes_ref = ray.put(planes)
    bucketed = emb_ds.map_batches(
        LshBucketUDF, fn_constructor_args=(planes_ref,),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 2),
    )
    qids = sorted(queries)
    qm = np.stack([queries[i] for i in qids]).astype(np.float32)
    qbits = (qm @ planes.T) > 0
    qbuckets = {}
    for row, qid in enumerate(qids):
        b = 0
        for p in range(planes.shape[0]):
            b |= int(qbits[row, p]) << p
        qbuckets.setdefault(b, []).append(qid)
    qb_ref = ray.put({b: {q: queries[q] for q in qs} for b, qs in qbuckets.items()})

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(qb_ref)
        bucket = int(group["bucket"].iloc[0])
        qs = table.get(bucket)
        if not qs:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cosine": [], "rank": []})
        emb = np.asarray(group["embedding"].tolist(), dtype=np.float32)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        emb = emb / norms
        rows = []
        for qid, qv in sorted(qs.items()):
            qv = qv / (np.linalg.norm(qv) or 1.0)
            sims = emb @ qv.astype(np.float32)
            order = np.lexsort((group["vec_id"].to_numpy(), -sims))[:k]
            for rank, idx in enumerate(order, 1):
                rows.append((qid, int(group["vec_id"].iloc[idx]), float(sims[idx]), rank))
        return pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine", "rank"])

    out = bucketed.groupby("bucket").map_groups(per_bucket, batch_format="pandas")
    return (
        out.to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


# --- IVF (inverted-file) ANN — the second scale path -----------------------
def _kmeans(sample: np.ndarray, n_lists: int, iters: int = 8,
            seed: int = 11) -> np.ndarray:
    """Tiny deterministic k-means for the coarse quantizer (numpy only)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivf_topk(
    emb_ds: ray.data.Dataset,
    queries: dict[int, np.ndarray],
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
) -> pd.DataFrame:
    """IVF ANN: a coarse k-means quantizer (trained on a bounded sample)
    partitions vectors into inverted lists; each query scans only its
    ``n_probe`` nearest lists. The groupby on list id is the only
    shuffle; centroids are broadcast once via ray.put."""
    sample = np.asarray(
        emb_ds.limit(train_sample).to_pandas()["embedding"].tolist(),
        dtype=np.float64,
    )
    cent = _kmeans(sample, n_lists)
    cent_ref = ray.put(cent)

    class AssignList:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, emb = _batch_matrix(batch)
            d = ((emb[:, None, :] - self.cent[None, :, :]) ** 2).sum(axis=2)
            lists = d.argmin(axis=1).astype(np.int64)
            return pa.table(
                {
                    "list_id": pa.array(lists, pa.int64()),
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": batch.column("embedding"),
                }
            )

    # probe lists per query (driver side; queries are tiny)
    qids = sorted(queries)
    qm = np.stack([queries[q] for q in qids]).astype(np.float64)
    qd = ((qm[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = {}  # list_id -> {query_id: vector}
    for row, qid in enumerate(qids):
        for lid in np.argsort(qd[row])[:n_probe]:
            probes.setdefault(int(lid), {})[qid] = queries[qid]
    probes_ref = ray.put(probes)

    def scan(group: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(probes_ref)
        qs = table.get(int(group["list_id"].iloc[0]))
        if not qs:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cosine": []})
        emb = np.asarray(group["embedding"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        emb = emb / norms
        rows = []
        for qid, qv in sorted(qs.items()):
            qv = qv / (np.linalg.norm(qv) or 1.0)
            sims = emb @ qv
            for i in np.argsort(-sims)[:k]:
                rows.append((qid, int(group["vec_id"].iloc[i]), float(sims[i])))
        return pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine"])

    partial = (
        emb_ds.map_batches(AssignList, batch_format="pyarrow",
                           batch_size=4096, concurrency=(1, 2))
        .groupby("list_id")
        .map_groups(scan, batch_format="pandas")
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = partial.groupby("query_id").map_groups(merge, batch_format="pandas")
    return out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
