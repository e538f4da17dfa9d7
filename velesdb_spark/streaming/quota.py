"""Streaming per-key admission quota — the continuous-ingest twin of
``functions/sampling.py cap_per_group`` (bound any one domain's share of
a crawl as documents ARRIVE, instead of capping a finished corpus).

Reference anchor: the reference bounds per-collection ingest via its
upsert path (collection CRUD guards); at cluster scale the analogous
guard is a per-domain admission quota on the ingest stream.

Scale design: ``applyInPandasWithState`` with EIGHT BYTES of state per
key (the admitted count) — the batch operator's window needs the corpus,
the stream needs a long per domain, so state is O(|domains|) forever and
needs no watermark. Admission is deterministic: within a micro-batch a
key's rows are sorted by id before drawing against the remaining quota,
so a drain of time-ordered files equals the batch
ROW_NUMBER-by-(file order, id) rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

OUT_SCHEMA = StructType([
    StructField("g_key", StringType()),
    StructField("adm_id", LongType()),
])


def stream_quota(df: DataFrame, k: int, group_col: str = "source",
                 id_col: str = "doc_id") -> DataFrame:
    """Admit a row iff fewer than ``k`` rows of its key were admitted
    before it (ties within a micro-batch broken by ascending id).
    Emits (g_key, adm_id) for admitted rows only."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        n = state.get[0] if state.exists else 0
        ids: list = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["_id"])
        ids.sort()
        take = max(0, int(k) - n)
        admitted = ids[:take]
        state.update((n + len(admitted),))
        if admitted:
            yield pd.DataFrame({"g_key": [key[0]] * len(admitted),
                                "adm_id": admitted})

    prepped = df.select(F.col(group_col).alias("_g"),
                        F.col(id_col).alias("_id"))
    return (prepped.groupBy("_g")
            .applyInPandasWithState(
                update, OUT_SCHEMA, "n long",
                "append", GroupStateTimeout.NoTimeout))
