"""Deterministic synthetic transcript table (FIXTURES.md §1).

Schema matches BASELINE.json.input_hint exactly:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
 ts:timestamp[us]).

Synthesis recipe (seed fixed, no wall-clock values):
- conversation lengths from a zipf-ish distribution + ONE giant
  conversation (>= 20x median turns) to exercise the salted-skew path
- per-turn HTML drawn from a fixture-derived template pool cycling the
  parser-algorithm categories, plus a few multi-hundred-KB documents
- rows written SHUFFLED (seeded permutation) so turn ordering must be
  restored by the pipeline, never inherited from file order
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
EPOCH_US = 1_700_000_000_000_000  # fixed epoch, microseconds

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["", "search", "browser", "python", ""]

# HTML templates cycling the parser-algorithm categories (FIXTURES.md §3).
# {i} and {j} are filled per turn so text content is unique per row.
_TEMPLATES = [
    # plain + entities
    "<p>Turn {i}: result &amp; summary &notin; scope &#x2713; item {j}</p>",
    # tags + attributes, duplicates, unquoted
    "<div id=t{i} class='msg' data-k={j} data-k=dup><span>payload {i}</span></div>",
    # comments + doctype
    "<!DOCTYPE html><!-- turn {i} --><article>doc {j} body text</article>",
    # rcdata / rawtext
    "<html><head><title>T{i}</title><style>.c{{color:red}}</style></head><body><p>styled {j}</p></body></html>",
    # script data with escapes
    "<script>if (a<{i}) {{ /* <script>x</script> */ }}</script><p>after script {j}</p>",
    # implicit structure
    "turn {i} naked text with <b>inline {j}</b> markup",
    # tables + foster parenting
    "<table><tr><td>r{i}c1</td><td>r{i}c2</td></tr>stray{j}</table>",
    # formatting / adoption agency
    "<p>x<b>bold {i}<p>cont</b>plain {j}",
    # implied end tags
    "<ul><li>item {i}<li>item {j}</ul><dl><dt>k<dd>v</dl>",
    # select
    "<form><select><option>opt{i}<option selected>opt{j}</select></form>",
    # foreign content
    "<svg viewBox='0 0 10 10'><circle r='{j}'/><desc>shape {i}</desc></svg><p>after</p>",
    # malformed / EOF
    "<div class='unclosed {i}<p>recovered {j}",
    # boilerplate-heavy page
    (
        "<html><body><nav><a href=/>Home</a> <a href=/a>A</a> <a href=/b>B</a></nav>"
        "<div class=content><h1>Title {i}</h1><p>Main paragraph {i} with enough "
        "words to count as content for scoring purposes item {j}.</p></div>"
        "<footer><a href=/p>Privacy</a> © corp</footer></body></html>"
    ),
    # pre / verbatim
    "<pre>code line {i}\n  indent {j}</pre>",
    # modern <template> content (never rendered text; contents machinery)
    (
        "<div><template id=row{i}><tr><td>cell {j}</td></tr></template>"
        "<p>visible turn {i} body text item {j}</p></div>"
    ),
]


def _make_text(rng: np.random.Generator, i: int, big: bool) -> str:
    t = _TEMPLATES[i % len(_TEMPLATES)].replace("{i}", str(i)).replace(
        "{j}", str((i * 7) % 1000)
    )
    if big:
        # multi-hundred-KB wide row: repeated paragraphs (wide-row handling)
        filler = "".join(
            f"<p>filler paragraph {k} for giant turn {i} lorem ipsum text body</p>"
            for k in range(4000)
        )
        t = f"<html><body><h1>big {i}</h1>{filler}</body></html>"
    return t


def generate_transcripts(
    n_turns: int,
    out_dir: str,
    n_files: int = 16,
    seed: int = SEED,
    giant_frac: float = 0.1,
) -> str:
    """Write a deterministic shuffled transcript table; returns out_dir.

    ``giant_frac`` of all turns belong to ONE giant conversation
    (conv-giant) — the deliberate skew. ~1 in 2000 turns is a
    multi-hundred-KB document (wide rows).
    """
    rng = np.random.default_rng(seed)
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    giant_turns = max(1, int(n_turns * giant_frac))
    remaining = n_turns - giant_turns
    # zipf-ish lengths, clipped
    conv_no = 0
    while remaining > 0:
        length = int(min(rng.zipf(1.5), 200))
        length = min(length, remaining)
        cid = f"conv-{conv_no:06d}"
        conv_ids.extend([cid] * length)
        turn_idxs.extend(range(length))
        conv_no += 1
        remaining -= length
    conv_ids.extend(["conv-giant"] * giant_turns)
    turn_idxs.extend(range(giant_turns))

    n = len(conv_ids)
    texts = [
        _make_text(rng, i, big=(i % 2000 == 1999)) for i in range(n)
    ]
    roles = [ROLES[i % len(ROLES)] for i in range(n)]
    tools = [TOOLS[i % len(TOOLS)] for i in range(n)]
    ts = [EPOCH_US + ti * 1_000_000 for ti in turn_idxs]

    perm = rng.permutation(n)
    table = pa.table(
        {
            "conv_id": pa.array(np.array(conv_ids, dtype=object)[perm].tolist(), pa.string()),
            "turn_idx": pa.array(np.array(turn_idxs, dtype=np.int64)[perm], pa.int32()),
            "role": pa.array(np.array(roles, dtype=object)[perm].tolist(), pa.string()),
            "text": pa.array(np.array(texts, dtype=object)[perm].tolist(), pa.string()),
            "tool": pa.array(np.array(tools, dtype=object)[perm].tolist(), pa.string()),
            "ts": pa.array(np.array(ts, dtype=np.int64)[perm], pa.timestamp("us")),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    rows_per_file = (n + n_files - 1) // n_files
    for f in range(n_files):
        lo = f * rows_per_file
        hi = min(n, lo + rows_per_file)
        if lo >= hi:
            break
        pq.write_table(table.slice(lo, hi - lo), os.path.join(out_dir, f"part-{f:04d}.parquet"))
    return out_dir


def transcripts_for_sf(sf_dir: str, base_dir: str = "/tmp/graft_transcripts") -> str:
    """Deterministic transcripts cache keyed by the sf directory name.

    Scales row count with the named scale factor: sf0.001 → 5k turns,
    sf0.01 → 50k, sf0.1 → 500k. Generated once and reused.
    """
    name = os.path.basename(os.path.normpath(sf_dir)) or "sf0.001"
    scale = {"sf0.001": 5_000, "sf0.01": 50_000, "sf0.1": 2_000_000}.get(name, 5_000)
    out_dir = os.path.join(base_dir, name)
    marker = os.path.join(out_dir, "_COMPLETE_v3")
    if not os.path.exists(marker):
        generate_transcripts(scale, out_dir)
        with open(marker, "w") as f:
            f.write("ok")
    return out_dir
