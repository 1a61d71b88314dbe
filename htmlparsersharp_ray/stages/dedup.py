"""Deduplication operators over the documents table.

Large-scale training-data hygiene ops (first-class per the build brief,
beyond the reference's own operator set — SURVEY.md §2.6 lists exact dedup
as engine-level design):

- exact_dedup        : content-hash → hash-partitioned group → keep first
- minhash_lsh_pairs  : shingle → 64-perm MinHash → band → bucket groupby →
                       candidate pairs → exact-Jaccard verify
- simhash_pairs      : 64-bit SimHash → 4×16-bit band buckets → Hamming ≤ k
- ngram_jaccard_pairs: exact word-n-gram Jaccard inside LSH buckets

All operators are deterministic (fixed hash seeds), pre-aggregate inside
map_batches before any groupby, and emit pairs with doc_a < doc_b so
output is stable under parallelism.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_MERSENNE = (1 << 61) - 1
_N_PERM = 64
_BANDS = 16  # 16 bands × 4 rows
_ROWS = _N_PERM // _BANDS
_RNG = np.random.default_rng(1234)
_PERM_A = _RNG.integers(1, _MERSENNE, size=_N_PERM, dtype=np.int64)
_PERM_B = _RNG.integers(0, _MERSENNE, size=_N_PERM, dtype=np.int64)


def add_md5(batch: pa.Table) -> pa.Table:
    """Vectorized-enough content hash (hashlib.md5 is a C call per row)."""
    hashes = [hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()]
    return batch.append_column("text_md5", pa.array(hashes, pa.string()))


def exact_dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Keep the first (min doc_id) document per exact content hash.
    Shuffle key is the hash → perfectly balanced partitioning."""
    hashed = ds.map_batches(add_md5, batch_format="pyarrow")

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, "doc_id")

    return hashed.groupby("text_md5").map_groups(keep_first, batch_format="pandas")


def _shingles(text: str, n: int = 3):
    words = text.split()
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]


def _minhash_signature(text: str) -> np.ndarray:
    sh = _shingles(text)
    if not sh:
        return np.full(_N_PERM, _MERSENNE, dtype=np.int64)
    base = np.array([zlib.crc32(s.encode()) for s in sh], dtype=np.int64)
    # h_i(x) = (a_i * x + b_i) mod p, min over shingles — vectorized (S × P)
    vals = (base[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) % _MERSENNE
    return vals.min(axis=0)


class MinHashUDF:
    """Actor stage: doc → flattened (band, band_hash, doc_id) rows.
    One output row per band per doc; the following groupby on
    (band, band_hash) is the LSH bucketing shuffle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_band, out_hash, out_doc = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            sig = _minhash_signature(text or "")
            for b in range(_BANDS):
                chunk = sig[b * _ROWS:(b + 1) * _ROWS]
                h = zlib.crc32(chunk.tobytes())
                out_band.append(b)
                out_hash.append(h)
                out_doc.append(doc_id)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
                "doc_id": pa.array(out_doc, pa.int64()),
            }
        )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket (doc_a < doc_b)."""
    ids = sorted(group["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []})
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
    return pd.DataFrame(pairs, columns=["doc_a", "doc_b"])


def minhash_lsh_pairs(
    docs: ray.data.Dataset, jaccard_threshold: float = 0.8
) -> pd.DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Verification broadcasts the candidate docs' shingle sets via ray.put
    (candidates ≪ corpus); at larger scale the verify stage would join
    text back by doc_id instead — noted here as the scale path.
    """
    sig_ds = docs.map_batches(MinHashUDF, batch_format="pyarrow", batch_size=512, concurrency=(1, 4))
    cand = (
        sig_ds.groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    cand = cand.drop_duplicates().reset_index(drop=True)
    needed = set(cand["doc_a"]) | set(cand["doc_b"])
    texts = {}
    for batch in docs.iter_batches(batch_size=1024, batch_format="pyarrow"):
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            if doc_id in needed:
                texts[doc_id] = set(_shingles(text or ""))
    rows = []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = texts.get(a, set()), texts.get(b, set())
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        if j >= jaccard_threshold:
            rows.append((int(a), int(b), j))
    rows.sort()
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


# --- SimHash ---------------------------------------------------------------
def _simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for token in text.split():
        h = int.from_bytes(
            hashlib.blake2b(token.encode(), digest_size=8).digest(), "little"
        )
        bits = np.fromiter(((h >> i) & 1 for i in range(64)), dtype=np.int64, count=64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


class SimHashUDF:
    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        sigs = [_simhash64(t or "") for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "simhash": pa.array(np.array(sigs, dtype=np.uint64)),
            }
        )


def simhash_pairs(docs: ray.data.Dataset, max_hamming: int = 6) -> pd.DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 4×16-bit
    chunks (any pair within Hamming ≤ 3·16-bit-misses shares ≥1 chunk);
    verify exact Hamming distance within buckets."""
    sig = docs.map_batches(SimHashUDF, batch_format="pyarrow", batch_size=512, concurrency=(1, 4))

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sh = batch.column("simhash").to_pylist()
        b_out, k_out, d_out, s_out = [], [], [], []
        for d, s in zip(ids, sh):
            for b in range(4):
                b_out.append(b)
                k_out.append((s >> (16 * b)) & 0xFFFF)
                d_out.append(d)
                s_out.append(s)
        return pa.table({
            "band": pa.array(b_out, pa.int32()),
            "chunk": pa.array(k_out, pa.int32()),
            "doc_id": pa.array(d_out, pa.int64()),
            "simhash": pa.array(np.array(s_out, dtype=np.uint64)),
        })

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.uint64)
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = int(bin(int(hs[i]) ^ int(hs[j])).count("1"))
                if d <= max_hamming:
                    rows.append((int(ids[i]), int(ids[j]), d))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])

    out = (
        sig.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "chunk"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
    out = (
        out.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    return out


def ngram_jaccard_pairs(
    docs: ray.data.Dataset, n: int = 3, threshold: float = 0.5
) -> pd.DataFrame:
    """Exact word-n-gram Jaccard near-dup pairs, using MinHash+LSH only to
    propose candidates (never to decide): the decision is the exact Jaccard
    over n-gram sets. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    out = minhash_lsh_pairs(docs, jaccard_threshold=threshold)
    return out


def embedding_cosine_dup_pairs(
    docs_emb: ray.data.Dataset, threshold: float = 0.95, n_planes: int = 8
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Scale path: random-hyperplane LSH buckets vectors (near-identical
    vectors collide in every bucket of several rotated tables with high
    probability); exact cosine verifies within buckets. Input dataset needs
    (vec_id:int64, embedding:list<float>). Deterministic planes (seed 77).
    """
    rng = np.random.default_rng(77)

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_pylist()
        emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        emb = emb / norms
        planes = np.random.default_rng(77).standard_normal((n_planes, emb.shape[1]))
        bits = (emb @ planes.T) > 0
        buckets = np.zeros(len(ids), dtype=np.int64)
        for p in range(n_planes):
            buckets |= bits[:, p].astype(np.int64) << p
        return pa.table({
            "bucket": pa.array(buckets, pa.int64()),
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": batch.column("embedding"),
        })

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("vec_id").sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "cosine": []})
        emb = np.asarray(g["embedding"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        emb = emb / norms
        sims = emb @ emb.T
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    rows.append((int(ids[i]), int(ids[j]), float(sims[i, j])))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "cosine"])

    out = (
        docs_emb.map_batches(bucketize, batch_format="pyarrow", batch_size=4096)
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "cosine": []})
    return (
        out.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def embedding_cosine_dup_pairs_exact(
    docs_emb: ray.data.Dataset, threshold: float = 0.45
) -> pd.DataFrame:
    """Exact embedding-cosine near-dup pairs (the brute-force baseline to
    the LSH scale path above): per batch, numpy matmul of the batch's
    vectors against the BROADCAST full normalized matrix (ray.put once),
    emitting pairs (a < b) with cosine >= threshold. O(N·B) per batch —
    correct at any scale where the full matrix fits a worker (beyond that,
    use embedding_cosine_dup_pairs)."""
    import ray as _ray

    full = docs_emb.to_pandas()
    ids_all = full["vec_id"].to_numpy()
    mat = np.asarray(full["embedding"].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    ref = _ray.put((ids_all, mat))

    class PairFinder:
        def __init__(self):
            self.ids_all, self.mat = _ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("vec_id").to_pylist())
            emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
            nr = np.linalg.norm(emb, axis=1, keepdims=True)
            nr[nr == 0] = 1.0
            emb = emb / nr
            sims = emb @ self.mat.T  # (batch, N)
            ii, jj = np.nonzero(sims >= threshold)
            a_ids = ids[ii]
            b_ids = self.ids_all[jj]
            keep = a_ids < b_ids
            return pa.table(
                {
                    "doc_a": pa.array(a_ids[keep], pa.int64()),
                    "doc_b": pa.array(b_ids[keep], pa.int64()),
                }
            )

    out = docs_emb.map_batches(
        PairFinder, batch_format="pyarrow", batch_size=4096, concurrency=(1, 2)
    ).to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def dup_clusters(
    nodes: ray.data.Dataset, edges: pd.DataFrame, id_col: str = "doc_id",
    max_iters: int = 50
) -> pd.DataFrame:
    """Connected components over near-dup pairs → cluster representative
    per node (min id in component) — the decision step that turns pair
    detection into keep-first dedup.

    Min-label propagation: each round, every node takes the min label among
    itself and its neighbors, via map_batches over the node set with the
    current label table broadcast (labels are O(nodes); at 100 TB scale the
    same rounds run as hash-partitioned joins on (node → label) instead of
    a broadcast — the iteration structure is identical). Deterministic;
    converges in O(diameter) rounds.
    """
    import ray as _ray

    adj: dict[int, list[int]] = {}
    for a, b in zip(edges["doc_a"], edges["doc_b"]):
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    ids = [int(x) for x in nodes.to_pandas()[id_col]]
    labels = {i: i for i in ids}
    adj_ref = _ray.put(adj)

    for _ in range(max_iters):
        labels_ref = _ray.put(labels)

        def relabel(batch: pa.Table) -> pa.Table:
            lab = _ray.get(labels_ref)
            graph = _ray.get(adj_ref)
            out_id, out_label = [], []
            for node in batch.column(id_col).to_pylist():
                node = int(node)
                best = lab[node]
                for nb in graph.get(node, ()):
                    if lab[nb] < best:
                        best = lab[nb]
                out_id.append(node)
                out_label.append(best)
            return pa.table({id_col: pa.array(out_id, pa.int64()),
                             "cluster_rep": pa.array(out_label, pa.int64())})

        new = nodes.map_batches(relabel, batch_format="pyarrow",
                                batch_size=4096).to_pandas()
        new_labels = dict(zip(new[id_col].astype(int), new["cluster_rep"].astype(int)))
        if new_labels == labels:
            break
        labels = new_labels
    out = pd.DataFrame(
        {id_col: sorted(labels), "cluster_rep": [labels[k] for k in sorted(labels)]}
    )
    return out
