"""The degenerate-input mirror: on one-sided or empty inputs the
two-sample/bivariate statistics return EMPTY frames, and their oracle
SQL must agree (review finding: ungrouped SQL aggregates emit one
NULL/0 row unless guarded). Runs the actual oracle_sql() strings
through DuckDB on synthesized tables — no Ray needed.
"""

from __future__ import annotations

import importlib.util

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__ray_entry___test", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_events(tmp_path, types_vals):
    n = len(types_vals)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array([t for t, _ in types_vals]),
        "value": pa.array([float(v) for _, v in types_vals],
                          pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    tmp_path.mkdir(parents=True, exist_ok=True)
    p = str(tmp_path / "events.parquet")
    pq.write_table(t, p)
    return p


TWO_SAMPLE = ["events_ks_test", "events_mannwhitney",
              "events_hodges_lehmann"]
WHOLE_TABLE = ["events_spearman", "events_kendall",
               "events_mutual_info"]


def _run(sql, path):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    return con.sql(sql).fetchall()


class TestOracleDegenerateGuards:
    def test_one_sided_sample_yields_no_rows(self, tmp_path):
        oracles = _entry().oracle_sql()
        p = _write_events(tmp_path / "a",
                          [("view", 1.0), ("view", 2.0),
                           ("click", 9.0)])
        for name in TWO_SAMPLE:
            assert _run(oracles[name], p) == [], name

    def test_empty_table_yields_no_rows(self, tmp_path):
        oracles = _entry().oracle_sql()
        p = _write_events(tmp_path / "b", [])
        for name in TWO_SAMPLE + WHOLE_TABLE:
            assert _run(oracles[name], p) == [], name

    def test_both_sided_still_yields_one_row(self, tmp_path):
        oracles = _entry().oracle_sql()
        p = _write_events(tmp_path / "c",
                          [("view", 1.0), ("purchase", 2.0)])
        for name in TWO_SAMPLE + WHOLE_TABLE:
            assert len(_run(oracles[name], p)) == 1, name
