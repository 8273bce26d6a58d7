"""Streaming near-duplicate detection — the Structured Streaming face of
the incremental MinHash index (operators/dedup.py
``incremental_minhash_pairs``).

This is the steady-state corpus-dedup loop an ingest pipeline actually
runs at 100 TB, expressed as one ``foreachBatch`` sink over a document
stream:

  1. sketch the micro-batch once (``minhash_sketch``),
  2. persist the batch's sketch under ``index_dir/batch-<epoch>`` —
     per-epoch overwrite makes a replayed epoch idempotent (same
     discipline as the ingest sink, ingest.py),
  3. pair the batch against the index AS OF the prior epochs
     (band equi-join + exact-Jaccard verify; the index is only touched
     through matched buckets, never re-sketched),
  4. append verified pairs under ``pairs_dir/batch-<epoch>``.

The index is a plain parquet table of (doc, shingles, sig) rows — the
persistable sketch schema — so it survives restarts, is shared with the
batch path, and any downstream job (cluster collapse, leakage-safe
split) can read the accumulated pairs directory.

Reference parity: the reference's closest machinery is the landing-log +
MERGE load discipline (`/root/reference/src/data_processor/loader.py` family);
streaming dedup is an LLM-pipeline extension on the same
sketch-then-join shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_document_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a document landing directory."""
    return spark.readStream.schema(DOCS_SCHEMA).parquet(path)


def _prior_batches(
    spark: SparkSession, index_dir: str, current: str | None = None
) -> list[str]:
    """List batch-* partial directories through Hadoop's FileSystem,
    excluding ``current`` (pass None to list ALL partials — the
    streaming/sketches.py merge-on-read path).

    A driver-local os.listdir would return [] for any non-local
    ``index_dir`` (hdfs://, s3a:// — the steady-state deployment) and
    the sink would silently run with an EMPTY index, dropping every
    cross-batch pair. The Hadoop API resolves whatever filesystem the
    URI names, so local paths keep working and remote ones are real.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    current_name = (
        jvm.org.apache.hadoop.fs.Path(current).getName()
        if current is not None
        else None
    )
    out = []
    for status in fs.listStatus(hpath):
        p = status.getPath()
        name = p.getName()
        if status.isDirectory() and name.startswith("batch-") and name != current_name:
            out.append(p.toString())
    return sorted(out)


def start_streaming_dedup(
    docs: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 1,
    num_hashes: int = 48,
    bands: int = 2,
    jaccard_threshold: float = 0.97,
):
    """Start the dedup stream; returns the StreamingQuery.

    Each epoch's output pair set equals the batch-touching subset of a
    full-corpus recompute over everything ingested so far (the
    ``incremental_minhash_pairs`` equivalence contract), so draining the
    stream and unioning ``pairs_dir`` reproduces the batch pipeline's
    answer exactly — tested in tests/test_streaming_dedup.py.
    """
    from ..operators.dedup import incremental_minhash_pairs, minhash_sketch

    conf = dict(shingle_k=shingle_k, num_hashes=num_hashes)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        batch_path = os.path.join(index_dir, f"batch-{epoch_id}")
        minhash_sketch(batch_df, id_col, text_col, **conf).write.mode(
            "overwrite"
        ).parquet(batch_path)
        batch_sketch = spark.read.parquet(batch_path)
        prior = _prior_batches(spark, index_dir, batch_path)
        index = (
            spark.read.parquet(*prior)
            if prior
            else spark.createDataFrame([], batch_sketch.schema)
        )
        pairs = incremental_minhash_pairs(
            index,
            batch_sketch,
            num_hashes=num_hashes,
            bands=bands,
            jaccard_threshold=jaccard_threshold,
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch-{epoch_id}")
        )

    return (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
