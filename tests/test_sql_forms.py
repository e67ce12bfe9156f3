"""SQL-frontend parity: each Spark SQL text form must produce exactly
the rows of its DataFrame twin — two frontends, one Catalyst plan."""

from __future__ import annotations

import pytest

from energydatalake_spark.plans.registry import QUERIES
from energydatalake_spark.plans.sql_forms import (
    SQL_FORMS,
    SQL_FORMS_UNORDERED,
    run_sql_form,
)

from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(SQL_FORMS))
def test_sql_form_matches_dataframe(spark, name):
    df_rows = [tuple(r) for r in QUERIES[name].build(spark, SF_SMOKE).collect()]
    sql_rows = [tuple(r) for r in run_sql_form(spark, SF_SMOKE, name).collect()]
    assert sql_rows == df_rows
    assert len(sql_rows) > 0


@pytest.mark.parametrize("name", sorted(SQL_FORMS_UNORDERED))
def test_unordered_sql_form_matches_dataframe(spark, name):
    """Twin declares no output order — compare as sorted row lists."""
    df_rows = sorted(
        tuple(r) for r in QUERIES[name].build(spark, SF_SMOKE).collect()
    )
    sql_rows = sorted(
        tuple(r) for r in run_sql_form(spark, SF_SMOKE, name).collect()
    )
    assert sql_rows == df_rows
    assert len(sql_rows) > 0
