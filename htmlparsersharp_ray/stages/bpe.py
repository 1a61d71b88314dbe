"""Distributed BPE (byte-pair-encoding) vocabulary learning.

The classic subword-vocabulary trainer (Sennrich et al., ACL 2016 —
public algorithm): start from characters, repeatedly merge the globally
most frequent adjacent symbol pair. The training input is the DISTINCT
word-frequency table (standard trick: pair statistics over distinct
words weighted by count equal statistics over the raw corpus), which is
what makes the op distributable — the corpus collapses to one bounded
word-hash exchange up front, and each merge iteration is then

  1. a PAIR-COUNT exchange: per-block vectorized (left, right, weight)
     partials → pair-hash bucket groupby → per-bucket top-1 → the
     driver reduces n_buckets candidate rows to ONE winner
     (count desc, then lexicographic (left, right) — deterministic), and
  2. a MAP-ONLY resegmentation of the word table (no shuffle).

Both halves are O(total symbols) numpy per block — no per-word Python
loop: pair counting flattens every word's symbol list into one array
(adjacent pairs = two shifted views masked at word boundaries, weighted
groupby-sum), and the greedy left-to-right merge uses run-parity
selection (candidate positions are only ever adjacent when left==right;
keeping even offsets within each candidate run IS the greedy scan),
then one vectorized scalar assignment + np.delete.

Everything is integer counting with total-order tie-breaks, so the
merge list is bitwise-deterministic at any parallelism and block
layout — pytest gates equality against a sequential dict-based
reference. Not SQL-expressible (iterative argmax + procedural
resegmentation): the graded query is rows-only with the differential
gate. At larger merge counts real trainers maintain an incremental
pair index instead of recounting; the recount keeps every iteration a
pure Dataset pass (resumable, spillable) and is the right trade until
the word table stops fitting a pass.

Reference n/a — engine-level extension (training-data pipeline op).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .hashing import hash_strings64


def _word_freq_table(docs: ray.data.Dataset, n_buckets: int) -> ray.data.Dataset:
    """Distinct (word, count) over lower(trim(text)) whitespace tokens
    (the repo-wide tokenization convention), bucketed by word hash;
    symbols start as the word's characters."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        text = b["text"].fillna("").str.strip().str.lower()
        toks = text[text != ""].str.split()
        counts = toks.explode().value_counts()
        out = pd.DataFrame({"word": counts.index.astype(str),
                            "n": counts.to_numpy().astype("int64")})
        th = hash_strings64(out["word"].to_numpy(), categorize=False)
        out["wb"] = (th % np.uint64(n_buckets)).astype(np.int64)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("word", as_index=False)["n"].sum()
        return pd.DataFrame({"word": m["word"].astype(str),
                             "n": m["n"].astype("int64")})

    def to_symbols(b: pd.DataFrame) -> pa.Table:
        words = b["word"].astype(str).tolist()
        return pa.table({
            "n": pa.array(b["n"].to_numpy(dtype=np.int64)),
            "sym": pa.array([list(w) for w in words],
                            pa.list_(pa.string())),
        })

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("wb")
        .map_groups(combine, batch_format="pandas")
        .map_batches(to_symbols, batch_format="pandas")
    )


def _flatten(batch: pa.Table):
    """(flat symbol object array, word lengths, word weights) for one
    block of the word table — the shared front of count and merge."""
    sym = batch.column("sym").combine_chunks()
    if isinstance(sym, pa.ChunkedArray):  # pragma: no cover
        sym = sym.combine_chunks()
    flat = np.asarray(sym.flatten().to_pylist(), dtype=object)
    offs = sym.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offs).astype(np.int64)
    w = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, lens, w


def _pair_partials(batch: pa.Table, n_buckets: int) -> pd.DataFrame:
    """Weighted adjacent-pair counts of one block, pre-aggregated —
    EVERY adjacent occurrence counts (overlaps included), matching the
    published counting rule."""
    flat, lens, w = _flatten(batch)
    if not len(flat):
        return pd.DataFrame({"pb": pd.Series([], dtype="int64"),
                             "l": pd.Series([], dtype="object"),
                             "r": pd.Series([], dtype="object"),
                             "c": pd.Series([], dtype="int64")})
    wid = np.repeat(np.arange(len(lens)), lens)
    inner = wid[:-1] == wid[1:]          # pair stays inside its word
    l = flat[:-1][inner]
    r = flat[1:][inner]
    ww = np.repeat(w, lens)[:-1][inner]
    part = (pd.DataFrame({"l": l, "r": r, "c": ww})
            .groupby(["l", "r"], as_index=False, sort=False)["c"].sum())
    ph = (hash_strings64(part["l"].to_numpy(dtype=object), categorize=False)
          * np.uint64(1000003)
          + hash_strings64(part["r"].to_numpy(dtype=object), categorize=False))
    part["pb"] = (ph % np.uint64(n_buckets)).astype(np.int64)
    return part[["pb", "l", "r", "c"]]


def _bucket_top1(g: pd.DataFrame) -> pd.DataFrame:
    m = g.groupby(["l", "r"], as_index=False)["c"].sum()
    m = m.sort_values(["c", "l", "r"], ascending=[False, True, True],
                      kind="mergesort")
    return m.head(1)[["l", "r", "c"]].astype({"c": "int64"})


def _apply_merge(batch: pa.Table, left: str, right: str) -> pa.Table:
    """Greedy left-to-right merge of (left, right) in every word —
    vectorized run-parity selection + one np.delete."""
    flat, lens, w = _flatten(batch)
    if not len(flat):
        return batch
    wid = np.repeat(np.arange(len(lens)), lens)
    cand = np.zeros(len(flat), dtype=bool)
    if len(flat) > 1:
        cand[:-1] = ((flat[:-1] == left) & (flat[1:] == right)
                     & (wid[:-1] == wid[1:]))
    idx = np.flatnonzero(cand)
    if not len(idx):
        return batch
    # runs of consecutive candidate positions only occur when
    # left == right ("aaa"); even offsets within a run == greedy scan
    run_start = np.r_[True, np.diff(idx) != 1]
    run_id = np.cumsum(run_start) - 1
    offset = np.arange(len(idx)) - np.flatnonzero(run_start)[run_id]
    keep = idx[offset % 2 == 0]
    flat[keep] = left + right
    flat = np.delete(flat, keep + 1)
    drops = np.bincount(wid[keep + 1], minlength=len(lens))
    new_lens = lens - drops
    return pa.table({
        "n": pa.array(w),
        "sym": pa.array(
            np.split(flat, np.cumsum(new_lens)[:-1].astype(np.int64)),
            pa.list_(pa.string())),
    })


def bpe_learn(docs: ray.data.Dataset, n_merges: int = 20,
              n_buckets: int = 64) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    table ``(rank, left, right, pair_count)`` — bitwise-deterministic
    (see module docstring). The word table never leaves the object
    store; the driver holds one (left, right, count) winner per
    iteration."""
    from .exchange import checkpoint

    words = checkpoint(_word_freq_table(docs, n_buckets))
    merges = []
    for rank in range(n_merges):
        cands = (
            words.map_batches(
                lambda b: _pair_partials(b, n_buckets),
                batch_format="pyarrow")
            .groupby("pb")
            .map_groups(_bucket_top1, batch_format="pandas")
            .to_pandas()          # ≤ n_buckets candidate rows
        )
        if cands.empty:
            break
        cands = cands.sort_values(["c", "l", "r"],
                                  ascending=[False, True, True],
                                  kind="mergesort")
        left, right, count = (str(cands.iloc[0]["l"]),
                              str(cands.iloc[0]["r"]),
                              int(cands.iloc[0]["c"]))
        merges.append((rank, left, right, count))
        # checkpoint, not materialize: each round derives from the
        # previous round twice (pair-count pass + resegmentation), so
        # bare materialize() nests plans — exchange.py::checkpoint
        words = checkpoint(words.map_batches(
            lambda b, lft=left, rgt=right: _apply_merge(b, lft, rgt),
            batch_format="pyarrow",
        ))
    return pd.DataFrame(merges, columns=["rank", "left", "right",
                                         "pair_count"]).astype(
        {"rank": "int64", "pair_count": "int64"})


def bpe_learn_reference(word_counts: dict, n_merges: int = 20):
    """Sequential dict-based reference (the published algorithm,
    verbatim semantics) — the differential oracle for :func:`bpe_learn`.
    Takes {word: count}; returns the same merge list."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        pairs = {}
        for sym, c in vocab.items():
            for a, b in zip(sym[:-1], sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((rank, l, r, c))
        new_vocab = {}
        for sym, cnt in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def bpe_segment_counts(docs: ray.data.Dataset, merges: pd.DataFrame,
                       n_buckets: int = 64) -> ray.data.Dataset:
    """APPLY a learned merge list: segment every word with the merges in
    rank order and return the corpus subword-frequency table
    ``(subword, n)`` — the learn→apply pair is the full tokenizer
    story (vocab + corpus token statistics for it).

    Map-only until one token-hash exchange: each batch builds its own
    distinct word-count table, replays the merges with the same
    vectorized :func:`_apply_merge` kernel the trainer uses (so
    segmentation is BYTE-identical to training), then explodes to
    weighted subword partials. The merge list is a closure constant
    (a few hundred strings — no broadcast machinery needed)."""
    mlist = [(str(l), str(r)) for l, r in
             zip(merges["left"], merges["right"])]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        text = b["text"].fillna("").str.strip().str.lower()
        toks = text[text != ""].str.split()
        counts = toks.explode().value_counts()
        words = counts.index.astype(str).tolist()
        t = pa.table({
            "n": pa.array(counts.to_numpy().astype(np.int64)),
            "sym": pa.array([list(w) for w in words], pa.list_(pa.string())),
        })
        for left, right in mlist:
            t = _apply_merge(t, left, right)
        flat, lens, w = _flatten(t)
        part = (pd.DataFrame({"subword": flat,
                              "n": np.repeat(w, lens)})
                .groupby("subword", as_index=False, sort=False)["n"].sum())
        out = pd.DataFrame({"subword": part["subword"].astype(str),
                            "n": part["n"].astype("int64")})
        th = hash_strings64(out["subword"].to_numpy(), categorize=False)
        out["tb"] = (th % np.uint64(n_buckets)).astype(np.int64)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("subword", as_index=False)["n"].sum()
        return pd.DataFrame({"subword": m["subword"].astype(str),
                             "n": m["n"].astype("int64")})

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("tb")
        .map_groups(combine, batch_format="pandas")
    )


def bpe_segment_reference(word_counts: dict, merges: list) -> dict:
    """Sequential reference application — {subword: count} after
    replaying ``merges`` (as returned by :func:`bpe_learn_reference`)
    over a word-count dict."""
    out = {}
    for word, cnt in word_counts.items():
        sym = list(word)
        for m in merges:
            l, r = m[1], m[2]
            new, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            sym = new
        for s in sym:
            out[s] = out.get(s, 0) + cnt
    return out
