"""Engine facade: catalog, views, SQL surface."""

from __future__ import annotations

import pytest


def test_engine_table_catalog(engine):
    assert engine.table("lineitem").count() > 0
    with pytest.raises(KeyError):
        engine.table("nope")


def test_engine_sql_over_views(engine):
    engine.register_views()
    df = engine.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1"
    )
    rows = {r["l_returnflag"]: r["n"] for r in df.collect()}
    assert sum(rows.values()) == engine.table("lineitem").count()
