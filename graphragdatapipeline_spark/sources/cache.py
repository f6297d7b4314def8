"""Source-cache pattern (SURVEY §2.1 S8–S12): cache-first external
fetch as a DataFrame program.

The reference keeps per-key JSON/text file caches and fetches only
misses (wikidata_helpers.py:229-246, musicbrainz_helpers.py:52-56).
The engine version: the cache is a table; the pending set is a
left-anti join; the fetch runs per-partition over the misses only;
the result unions back into the cache. Incremental recompute without
any driver-side bookkeeping — and the anti-join scales where a
file-per-key cache directory cannot (10^9 keys = 10^9 inodes)."""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def incremental_fetch(
    requested: DataFrame,
    cache: DataFrame,
    key_col: str,
    fetch_fn: Callable[[Iterator], Iterator],
    result_schema: StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """Returns (updated_cache, fetched_only).

    `fetch_fn` is a mapInPandas kernel: per Arrow batch of missing
    keys, yield rows matching result_schema (the external call runs
    executor-side, batched — the engine analog of the reference's
    yield_batches_concurrently fan-out)."""
    misses = requested.select(key_col).distinct().join(
        cache.select(key_col), key_col, "left_anti"
    )
    fetched = misses.mapInPandas(fetch_fn, result_schema)
    updated = cache.unionByName(fetched, allowMissingColumns=True)
    return updated, fetched
