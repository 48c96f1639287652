"""Multimodal column plumbing: image/audio/video as opaque binary.

Design: media rides in a ``binary`` column with typed metadata
columns beside it (mime, width/height/duration, byte length, hash).
All *Spark-side* plumbing — schema, partition sizing, Arrow-batched
UDF signatures — is real and tested; the actual codec step is STUBBED
(the image/audio libraries are not in this container) behind
``decode_stub``/``extract_features_stub`` which raise or produce a
deterministic fake, clearly marked.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` at the default 128 MB so a task
holds ~128 MB of media, and NEVER groupBy/shuffle the binary column
itself; shuffle (id, metadata) and semi-join the payload back.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, mime string, n_bytes long, content_md5 string"
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media-shaped table from the documents fixture: the text
    encoded as utf-8 bytes stands in for an image/audio payload, with
    the typed metadata columns a real pipeline would carry."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(text_col)).alias("content_md5"),
    )


def decode_stub(payload: bytes) -> dict:
    """STUB: decode an image/audio payload. The real implementation
    needs PIL/librosa/etc. (not in this container)."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment; "
        "swap in PIL.Image.open / soundfile.read here"
    )


def extract_features_batched(df: DataFrame) -> DataFrame:
    """Feature extraction over media payloads via mapInPandas — the
    Arrow-batched shape a real decoder plugs into. The feature here is
    a deterministic fake (byte-histogram mean) so the plumbing (batch
    iteration, schema, column pruning) is fully exercised without
    codec libs.
    """
    out_schema = "doc_id long, n_bytes long, feat_mean double"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"]
            # deterministic fake for the codec step (see decode_stub)
            feat = payloads.map(
                lambda b: float(sum(b) / len(b)) if len(b) else 0.0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "feat_mean": feat,
                }
            )

    return df.mapInPandas(_extract, schema=out_schema)
