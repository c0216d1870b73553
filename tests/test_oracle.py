"""Differential test: every registered op with an oracle must match
DuckDB exactly at the oracle scale factor (mirrors the driver's t2)."""

from __future__ import annotations

import os

import pytest

from deltasink_spark import registry

registry.load_all()

WITH_ORACLE = sorted(registry.ORACLES)
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("op_id", WITH_ORACLE)
def test_oracle_match(spark, sf_oracle, op_id):
    from tests.diffcheck import compare

    compare(spark, sf_oracle, registry.QUERIES[op_id], registry.ORACLES[op_id], op_id)


@pytest.mark.parametrize("op_id", WITH_ORACLE)
def test_oracle_driver_canon(spark, sf_oracle, op_id):
    """Driver-canonicalizer hazards invisible to the value compare:
    array cells (pandas sort_values crash) and int64-vs-float64 dtype
    divergence (DuckDB HUGEINT) — the two r2 failure classes."""
    from tests.diffcheck import compare_driver_style

    compare_driver_style(
        spark, sf_oracle, registry.QUERIES[op_id], registry.ORACLES[op_id], op_id
    )


@pytest.mark.parametrize("op_id", ROWS_ONLY)
def test_rows_only_runs(spark, sf_oracle, op_id):
    df = registry.QUERIES[op_id](spark, sf_oracle)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.skipif(
    not __import__("os").environ.get("DS_SF01_ORACLE"),
    reason="10x-scale oracle sweep (~15 min); set DS_SF01_ORACLE=1 to run",
)
@pytest.mark.parametrize("op_id", WITH_ORACLE)
def test_oracle_match_sf01(spark, op_id):
    """Same differential gate at sf0.1 — 10x the driver's scale factor.
    This sweep caught two latent fp-determinism bugs (fractional-second
    RANGE frame boundaries; double-order-dependent UDAF sums) that were
    invisible at sf0.01."""
    from tests.diffcheck import compare

    compare(spark, "/root/testdata/sf0.1", registry.QUERIES[op_id], registry.ORACLES[op_id], op_id)


# --- empty-corpus robustness audit (r8) --------------------------------
#
# Opt-in sweep (DS_EMPTY_ORACLE=1): every oracle-bearing op runs against
# schema-preserving EMPTY fixture tables and must agree with DuckDB.
# This catches the global-agg-on-empty class (an ungrouped agg emits one
# NULL row where GROUP BY emits zero — the minhash_union '__direct__'
# bug the r8 review found) plus read-back-schema-inference and
# divide-by-zero edges (4 real bugs fixed when first run).
#
# Known engine-semantics divergence, excluded: Spark emits ZERO rows
# for CUBE/ROLLUP/GROUPING SETS over an empty relation, while DuckDB
# (and PostgreSQL, per the SQL standard) emit the grand-total grouping
# set's single row. Not fixable op-side without count-triggered plan
# branches; documented here instead.
_EMPTY_DIVERGENT = {"agg_cube", "agg_rollup", "agg_grouping_sets"}


@pytest.fixture(scope="session")
def sf_empty(tmp_path_factory):
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet"):
            schema = pq.read_schema(os.path.join(src, f))
            pq.write_table(schema.empty_table(), os.path.join(dst, f))
    return dst


@pytest.mark.skipif(
    not os.environ.get("DS_EMPTY_ORACLE"),
    reason="empty-corpus sweep is opt-in: DS_EMPTY_ORACLE=1",
)
@pytest.mark.parametrize("op", sorted(registry.ORACLES))
def test_empty_corpus_agreement(spark, sf_empty, op):
    from tests.diffcheck import compare

    if op in _EMPTY_DIVERGENT:
        pytest.skip("documented Spark-vs-SQL-standard grouping-sets-on-empty divergence")
    compare(spark, sf_empty, registry.QUERIES[op], registry.ORACLES[op], op)


# --- NULL-injection robustness audit (r8) ------------------------------
#
# Opt-in sweep (DS_NULL_ORACLE=1): every oracle-bearing op runs against
# fixtures with NULLs deterministically injected into the
# nullable-in-production columns (documents.text/lang/source,
# events.value/props) and must agree with DuckDB. First run found 18
# divergences: 4 hard crashes (scan_text line round-trip, ts_ewma
# zero-weight division, udaf_pandas/udtf_py Python workers on None)
# and 14 engine NULL-semantics mismatches (Spark concat_ws skips NULLs
# where SQL propagates them; from_json-isNotNull vs json_valid(NULL)).
# Every op now carries an explicit oracle-mirrored NULL contract
# (drop-at-ingest for text/value consumers, NULL-propagation for
# fn_json) — a no-op on the NULL-free fixtures.
_NULL_MODS = {
    "documents": (
        "SELECT doc_id, CASE WHEN doc_id % 11 = 3 THEN NULL ELSE text END AS text, "
        "CASE WHEN doc_id % 13 = 4 THEN NULL ELSE lang END AS lang, "
        "CASE WHEN doc_id % 17 = 5 THEN NULL ELSE source END AS source, n_chars "
    ),
    "events": (
        "SELECT event_id, ts, user_id, event_type, "
        "CASE WHEN event_id % 19 = 6 THEN NULL ELSE value END AS value, "
        "CASE WHEN event_id % 23 = 7 THEN NULL ELSE props END AS props "
    ),
}


@pytest.fixture(scope="session")
def sf_nulls(tmp_path_factory):
    import duckdb

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_nulls"))
    con = duckdb.connect()
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        sel = _NULL_MODS.get(f[:-8], "SELECT * ")
        con.execute(
            f"COPY ({sel} FROM read_parquet('{src}/{f}')) "
            f"TO '{dst}/{f}' (FORMAT PARQUET)"
        )
    return dst


@pytest.mark.skipif(
    not os.environ.get("DS_NULL_ORACLE"),
    reason="NULL-injection sweep is opt-in: DS_NULL_ORACLE=1",
)
@pytest.mark.parametrize("op", sorted(registry.ORACLES))
def test_null_injection_agreement(spark, sf_nulls, op):
    from tests.diffcheck import compare

    compare(spark, sf_nulls, registry.QUERIES[op], registry.ORACLES[op], op)
