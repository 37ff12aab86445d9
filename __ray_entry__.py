"""Driver contract for the graft builder (Ray Data target).

`entry()` runs the flagship CDC replay at sf0.001 scale; `queries()` /
`oracle_sql()` expose every implemented operator (SURVEY.md §2) over the
testdata tables with DuckDB oracles.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: deterministic synthetic changelog replay → partitioned
    Parquet lake → live snapshot Dataset (FIXTURES.md F1/F2)."""
    from arches_rascoll_etl_ray.pipelines.cdc_queries import cdc_replay_synthetic

    return cdc_replay_synthetic("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from arches_rascoll_etl_ray.pipelines import cdc_queries, relational

    out: dict[str, Callable[[str], Any]] = {}
    out.update(relational.QUERIES)
    out.update(cdc_queries.QUERIES)
    try:
        from arches_rascoll_etl_ray.pipelines import training

        out.update(training.QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from arches_rascoll_etl_ray.pipelines import cdc_queries, relational

    out: dict[str, str] = {}
    out.update(relational.ORACLE_SQL)
    out.update(cdc_queries.ORACLE_SQL)
    try:
        from arches_rascoll_etl_ray.pipelines import training

        out.update(training.ORACLE_SQL)
    except ImportError:
        pass
    return out
