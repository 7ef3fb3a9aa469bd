"""Shared registry plumbing: every query module declares its
(QUERIES, ORACLE, q) triple through one factory so registration
semantics (key -> callable, optional DuckDB oracle SQL) live in
exactly one place."""

from __future__ import annotations

from ..errors import ScaleRefusal

__all__ = ["ScaleRefusal", "make_registry"]


def make_registry():
    """Return (QUERIES, ORACLE, q): the module's key->fn map, its
    key->oracle-SQL map, and the ``@q(key, oracle_sql=None)``
    decorator that fills both."""
    queries: dict = {}
    oracle: dict = {}

    def q(key: str, oracle_sql: str | None = None):
        def deco(fn):
            queries[key] = fn
            if oracle_sql is not None:
                oracle[key] = oracle_sql
            return fn

        return deco

    return queries, oracle, q
