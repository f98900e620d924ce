"""Spark finalizer: collapse merged description arrays into one description.

Runs :func:`summarize_description_list` as an Arrow-batched pandas UDF over
the post-merge node/edge tables (one row per entity/edge, so no skew —
hot-key fan-in was already resolved by the salted merge).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

from ..functions.summary_core import summarize_description_list
from ..functions.tokenizer import get_tokenizer

_RESULT = StructType(
    [
        StructField("description", StringType()),
        StructField("llm_was_used", BooleanType()),
    ]
)


def finalize_descriptions(
    df: DataFrame,
    name_col: str,
    kind: str,
    tokenizer_kind: str = "auto",
) -> DataFrame:
    """Add ``description`` (+ ``llm_was_used``) from ``descriptions``."""

    tok_kind = tokenizer_kind

    @F.pandas_udf(_RESULT)
    def summarize_udf(names: pd.Series, desc_lists: pd.Series) -> pd.DataFrame:
        tokenizer = get_tokenizer(tok_kind)
        out_desc: list[str] = []
        out_used: list[bool] = []
        for name, frags in zip(names, desc_lists):
            frags = list(frags) if frags is not None else []
            text, used = summarize_description_list(kind, name, frags, tokenizer)
            out_desc.append(text)
            out_used.append(used)
        return pd.DataFrame({"description": out_desc, "llm_was_used": out_used})

    return df.withColumn("_sum", summarize_udf(F.col(name_col), F.col("descriptions"))).select(
        "*", F.col("_sum.description").alias("description"), F.col("_sum.llm_was_used")
    ).drop("_sum")
