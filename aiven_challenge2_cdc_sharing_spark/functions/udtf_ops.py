"""Python UDTF surface (SURVEY.md §2.10, optional tier): one row in,
many rows out, with Python logic — for the cases where even
explode-over-arrays can't express the expansion.

``SentenceSplitter`` is the canonical training-data example: split a
document into sentence-ish spans with char offsets.  Registered
per-session via ``register_udtfs``."""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="span_idx: int, start_pos: int, end_pos: int, sentence: string")
class SentenceSplitter:
    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        pos = 0
        for i, chunk in enumerate(re.split(r"(?<=[.!?])\s+", text)):
            if not chunk:
                continue
            start = text.index(chunk, pos)
            end = start + len(chunk)
            yield i, start, end, chunk
            pos = end


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("split_sentences", SentenceSplitter)
