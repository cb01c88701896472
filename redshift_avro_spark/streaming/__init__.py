"""Structured Streaming pipeline: the reference's third option made real.

The reference's README.md:54-58 sketches "decode in-flight with
Glue/EMR/KDA before landing in Redshift" and stops at "Code example
TBD". This package is that pipeline, Spark-first (SURVEY §2.1 S8,
§2.6 streaming rows): binary stream → envelope unwrap → Avro decode →
watermarked windowed aggregation / sessionization / in-stream dedup →
sinks (files, foreachBatch for JDBC/Redshift-style targets).
"""

from .pipeline import (  # noqa: F401
    decode_avro_stream,
    dedup_within_watermark,
    foreach_batch_sink,
    read_binary_file_stream,
    sessionized,
    windowed_agg,
)
