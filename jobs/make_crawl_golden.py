"""Materialize the pure-Python oracle crawler's golden items as parquet.

The graded ``crawl_wave_loop`` query's SQL oracle is a plain SELECT over
this fixture — turning the flagship crawl into a fully hash-graded row
instead of a rows-only check. The fixture is the output of
``corpus/oracle.py`` (an independent, single-threaded, no-Spark
implementation of the WAVE SEMANTICS contract) over the exact corpus
spec the graded query uses (``plans/queries_docs.graded_crawl_spec``).

Run after any change to the corpus spec, the oracle, or the wave
semantics::

    python jobs/make_crawl_golden.py

``tests/test_crawl_e2e.py::test_golden_fixture_fresh`` fails if the
committed parquet drifts from a fresh regeneration.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITEM_COLUMNS = [
    "url", "source", "title", "publish_time", "origin_url",
    "province", "city", "county", "site_name", "text", "wave",
]


def golden_items_pandas() -> pd.DataFrame:
    from crawler_spark.corpus import oracle as orc
    from crawler_spark.plans.queries_docs import (
        GOLDEN_WAVE_SECONDS, graded_crawl_spec,
    )

    res = orc.oracle_crawl(graded_crawl_spec(), wave_seconds=GOLDEN_WAVE_SECONDS)
    df = pd.DataFrame(res.items)[ITEM_COLUMNS].sort_values("url").reset_index(drop=True)
    df["wave"] = df["wave"].astype("int32")
    return df


def main() -> None:
    from crawler_spark.plans.queries_docs import GOLDEN_ITEMS_PARQUET

    df = golden_items_pandas()
    os.makedirs(os.path.dirname(GOLDEN_ITEMS_PARQUET), exist_ok=True)
    df.to_parquet(GOLDEN_ITEMS_PARQUET, index=False)
    print(f"wrote {len(df)} golden items -> {GOLDEN_ITEMS_PARQUET}")


if __name__ == "__main__":
    main()
