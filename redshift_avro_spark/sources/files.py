"""Avro file source & sink as a PySpark Python DataSource.

The runtime has no spark-avro jar, so ``spark.read.format("avro")``
would fail; this module registers a Python DataSource (Spark 4 API)
named ``avro_py`` ("avro" itself is reserved by Spark's resolver for
the absent built-in module) providing:

- **Splittable reads**: the driver lists files and cuts them into byte
  ranges; each task re-synchronizes on the 16-byte sync marker and
  decodes only the blocks starting inside its range (the classic
  Hadoop-Avro split protocol — reference datafile.py:38,192 sync
  markers "enable parallel splits", SURVEY §4). One 100 TB file fans
  out across executors with no coordination.
- **Schema-on-read with evolution**: the reader schema defaults to the
  first file's embedded writer schema; pass ``avroSchema`` to resolve
  heterogeneous/evolved files to one shape (reference io.py:990-1039).
- **Arrow-batched decode**: tasks yield pyarrow RecordBatches, skipping
  row-by-row Python→JVM conversion.
- **Writes**: one container file per partition with the configured
  codec (``compression`` option: null/deflate/bzip2/...), block-buffered
  at SYNC_INTERVAL like the reference writer (datafile.py:39).

- **Streaming reads** (round 3): :class:`AvroStreamReader` turns a
  landing-zone directory into a checkpointed micro-batch stream —
  ``{"n": k}`` offsets over the (mtime, name)-ordered file ledger,
  partition-per-file planning, executor-side decode via the same
  split machinery, per-run ``maxFilesPerBatch`` rate limit. Restart
  resumes exactly after the consumed prefix (test_stream_source).

Helpers :func:`read_avro` / :func:`write_avro` /
:func:`read_avro_stream` wrap the registration.
"""

from __future__ import annotations

import glob as globmod
import json
import os
import uuid
from dataclasses import dataclass
from typing import Any, Iterator, Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from ..avroio.container import (
    ContainerWriter,
    iter_block_spans,
    read_header,
)
from ..avroio.binary import BinaryReader, compile_resolver
from ..avroio.convert import avro_to_spark_type, df_schema_to_avro
from ..avroio.schema_model import AvroSchema, parse_schema

DEFAULT_SPLIT_SIZE = 32 * 1024 * 1024  # bytes; ~spark.sql.files.maxPartitionBytes


def _list_files(path: str) -> list[str]:
    """Resolve a file/dir/glob into data files (skip _SUCCESS, dotfiles)."""
    if os.path.isdir(path):
        entries = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        )
    elif os.path.isfile(path):
        entries = [path]
    else:
        entries = sorted(p for p in globmod.glob(path) if os.path.isfile(p))
    if not entries:
        raise FileNotFoundError(f"no Avro files at {path!r}")
    return entries


@dataclass
class AvroSplit(InputPartition):
    path: str
    start: int
    end: int
    schema_json: str  # file's own header schema (saves re-reading header)
    codec: str
    sync: bytes
    header_len: int


class AvroReader(DataSourceReader):
    def __init__(self, spark_schema: T.StructType, options: dict) -> None:
        self.spark_schema = spark_schema
        self.reader_schema_json = options.get("avroschema")
        path = options.get("path")
        if not path:
            raise ValueError("avro reader requires a path")
        self.split_size = int(options.get("splitsize", DEFAULT_SPLIT_SIZE))
        self.files = _list_files(path)

    def partitions(self) -> list[AvroSplit]:
        splits: list[AvroSplit] = []
        for path in self.files:
            size = os.path.getsize(path)
            with open(path, "rb") as fh:
                header = read_header(fh.read(1 << 16))
            n = max(1, (size + self.split_size - 1) // self.split_size)
            step = (size + n - 1) // n
            for s in range(0, size, step):
                splits.append(
                    AvroSplit(
                        path=path,
                        start=s,
                        end=min(s + step, size),
                        schema_json=header.schema_json,
                        codec=header.codec,
                        sync=header.sync,
                        header_len=header.header_len,
                    )
                )
        return splits

    def read(self, partition: AvroSplit) -> Iterator[Any]:
        return _decode_split(self.spark_schema, self.reader_schema_json, partition)


def _decode_split(
    spark_schema: T.StructType, reader_schema_json: Optional[str], partition: AvroSplit
) -> Iterator[Any]:
    """Decode one byte-range split of a container file into Arrow
    RecordBatches (shared by the batch reader and the streaming
    reader below)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    from ..avroio.codegen import get_batch_resolver
    from ..avroio.container import ContainerHeader

    writer_schema = parse_schema(partition.schema_json)
    target_json = reader_schema_json or partition.schema_json
    target = parse_schema(target_json)
    header = ContainerHeader(
        schema_json=partition.schema_json,
        codec=partition.codec,
        sync=partition.sync,
        meta={},
        header_len=partition.header_len,
    )
    arrow_schema = to_arrow_schema(spark_schema)
    names = [f.name for f in spark_schema.fields]
    # reads take the numpy vector stream decoder when the schemas are
    # identical (each block segments via composed skip tables and the
    # columns land in Arrow with no per-value Python objects — the S2
    # container twin of the raw-datum vector path), falling back PER
    # BLOCK to the generated columnar decoder (resolver variant for
    # evolution; order preserved by flushing pending codegen columns
    # before a vector batch); closure resolver only when codegen
    # declines
    from ..avroio.vectorized import VectorFallback, get_vector_decoder

    vdec = None
    if json.dumps(writer_schema.to_json()) == json.dumps(target.to_json()):
        cand = get_vector_decoder(json.dumps(target.to_json()))
        if cand is not None and [f[0] for f in cand.fields] == names:
            vdec = cand
    bd = get_batch_resolver(
        json.dumps(writer_schema.to_json()), json.dumps(target.to_json()), mode="spark"
    )
    if bd is not None and bd.names == names:
        cols = bd.new_columns()
        with open(partition.path, "rb") as fobj:
            for count, block in iter_block_spans(fobj, header, partition.start, partition.end):
                if vdec is not None:
                    try:
                        varrs = vdec.decode_stream_arrow(block, count)
                        if cols[0]:  # keep row order across mixed paths
                            yield _cols_to_record_batch(bd, cols, arrow_schema)
                            cols = bd.new_columns()
                        yield pa.RecordBatch.from_arrays(
                            [
                                varrs[nm]
                                if varrs[nm].type == arrow_schema.field(i).type
                                else varrs[nm].cast(arrow_schema.field(i).type)
                                for i, nm in enumerate(names)
                            ],
                            schema=arrow_schema,
                        )
                        continue
                    except VectorFallback:
                        pass
                bd.decode_stream(block, 0, count, cols)
                if len(cols[0]) >= 8192:
                    yield _cols_to_record_batch(bd, cols, arrow_schema)
                    cols = bd.new_columns()
        if cols[0]:
            yield _cols_to_record_batch(bd, cols, arrow_schema)
        return
    decode = compile_resolver(writer_schema, target, mode="spark")
    rows: list[dict] = []
    with open(partition.path, "rb") as fobj:
        for count, block in iter_block_spans(fobj, header, partition.start, partition.end):
            br = BinaryReader(block)
            for _ in range(count):
                rows.append(decode(br))
            if len(rows) >= 8192:
                yield _to_record_batch(rows, names, arrow_schema)
                rows = []
    if rows:
        yield _to_record_batch(rows, names, arrow_schema)


def _cols_to_record_batch(bd, cols: list[list], arrow_schema) -> Any:
    import pyarrow as pa

    arrays = []
    for i, col in enumerate(cols):
        series = bd.column_series(i, col)  # M8 view for raw-ts columns
        arrays.append(pa.Array.from_pandas(series, type=arrow_schema.field(i).type))
    return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


def _to_record_batch(rows: list[dict], names: list[str], arrow_schema) -> Any:
    import pyarrow as pa

    arrays = []
    for i, name in enumerate(names):
        col = [r.get(name) for r in rows]
        arrays.append(pa.array(col, type=arrow_schema.field(i).type, from_pandas=True))
    return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


@dataclass
class AvroCommit(WriterCommitMessage):
    file: str
    rows: int


class AvroWriter(DataSourceWriter):
    def __init__(self, spark_schema: T.StructType, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro writer requires a path")
        self.codec = options.get("compression", "deflate")
        self.record_name = options.get("recordname", "topLevelRecord")
        self.avro_schema_json = options.get("avroschema")
        self.spark_schema = spark_schema
        self.overwrite = overwrite
        # part files stage under a dot prefix (readers skip dotfiles) and
        # only commit() deletes old data + renames staged files into
        # place, so a job that fails mid-write leaves the previous
        # contents intact — overwrite is commit-atomic
        self.run_id = uuid.uuid4().hex[:8]
        os.makedirs(self.path, exist_ok=True)

    def _staging_prefix(self) -> str:
        return f".staged-{self.run_id}-"

    def write(self, iterator: Iterator[Any]) -> AvroCommit:
        from pyspark import TaskContext

        if self.avro_schema_json:
            schema = parse_schema(self.avro_schema_json)
        else:
            schema = df_schema_to_avro(self.spark_schema, name=self.record_name)
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        fname = os.path.join(
            self.path,
            f"{self._staging_prefix()}part-{pid:05d}-{uuid.uuid4().hex[:8]}.avro",
        )
        n = 0
        field_names = [f.name for f in self.spark_schema.fields]
        with open(fname, "wb") as fh:
            with ContainerWriter(fh, schema, codec=self.codec) as w:
                for row in iterator:
                    w.append(_row_to_dict(row, field_names))
                    n += 1
        return AvroCommit(file=fname, rows=n)

    def commit(self, messages: list[AvroCommit]) -> None:  # type: ignore[override]
        if self.overwrite:
            for f in os.listdir(self.path):
                if not f.startswith((".", "_")):
                    os.remove(os.path.join(self.path, f))
        prefix = self._staging_prefix()
        finals = []
        for m in messages:
            final = os.path.join(
                self.path, os.path.basename(m.file).replace(prefix, "", 1)
            )
            os.replace(m.file, final)
            finals.append(final)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(json.dumps({"files": finals, "rows": sum(m.rows for m in messages)}))

    def abort(self, messages: list[AvroCommit]) -> None:  # type: ignore[override]
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


def _row_to_dict(row: Any, field_names: list[str]) -> dict:
    if isinstance(row, dict):
        return row
    d = row.asDict(recursive=True) if hasattr(row, "asDict") else dict(zip(field_names, row))
    return d


class AvroDataSource(DataSource):
    """``spark.read.format("avro_py")`` / ``df.write.format("avro_py")``.

    (The name "avro" itself is reserved by Spark's resolver for the
    built-in-but-external spark-avro module even when its jar is absent,
    so a Python data source cannot claim it.)"""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> T.StructType:
        reader_json = self.options.get("avroschema")
        if reader_json:
            dtype = avro_to_spark_type(parse_schema(reader_json))
        else:
            path = self.options.get("path")
            if not path:
                raise ValueError("avro source requires a path")
            first = _list_files(path)[0]
            with open(first, "rb") as fh:
                dtype = avro_to_spark_type(read_header(fh.read(1 << 16)).schema)
        if not isinstance(dtype, T.StructType):
            raise TypeError("top-level Avro schema must be a record")
        return dtype

    def reader(self, schema: T.StructType) -> AvroReader:
        return AvroReader(schema, dict(self.options))

    def writer(self, schema: T.StructType, overwrite: bool) -> AvroWriter:
        return AvroWriter(schema, dict(self.options), overwrite)

    def streamReader(self, schema: T.StructType) -> "AvroStreamReader":
        return AvroStreamReader(schema, dict(self.options))

    def streamWriter(self, schema: T.StructType, overwrite: bool) -> "AvroStreamWriter":
        return AvroStreamWriter(schema, dict(self.options))


_REGISTERED: set[int] = set()


def register_avro_datasource(spark: SparkSession) -> None:
    key = id(spark)
    if key not in _REGISTERED:
        spark.dataSource.register(AvroDataSource)
        _REGISTERED.add(key)


def read_avro(
    spark: SparkSession,
    path: str,
    reader_schema: Union[AvroSchema, str, dict, None] = None,
    split_size: int = DEFAULT_SPLIT_SIZE,
) -> DataFrame:
    """Read Avro container files as a DataFrame (splittable, Arrow-batched)."""
    register_avro_datasource(spark)
    reader = spark.read.format("avro_py").option("splitSize", str(split_size))
    if reader_schema is not None:
        if not isinstance(reader_schema, AvroSchema):
            reader_schema = parse_schema(reader_schema)
        reader = reader.option("avroSchema", json.dumps(reader_schema.to_json()))
    return reader.load(path)


def write_avro(
    df: DataFrame,
    path: str,
    compression: str = "deflate",
    mode: str = "overwrite",
    record_name: str = "topLevelRecord",
    avro_schema: Union[AvroSchema, str, dict, None] = None,
) -> None:
    """Write a DataFrame as Avro container files (one per partition)."""
    register_avro_datasource(df.sparkSession)
    writer = (
        df.write.format("avro_py")
        .mode(mode)
        .option("compression", compression)
        .option("recordName", record_name)
    )
    if avro_schema is not None:
        if not isinstance(avro_schema, AvroSchema):
            avro_schema = parse_schema(avro_schema)
        writer = writer.option("avroSchema", json.dumps(avro_schema.to_json()))
    writer.save(path)


# ---------------------------------------------------------------------------
# Streaming source: the Avro landing-zone connector
# ---------------------------------------------------------------------------


class AvroStreamReader(DataSourceStreamReader):
    """Micro-batch streaming reader over a growing directory of Avro
    container files — the landing-zone shape a Kinesis Firehose /
    Kafka-connect sink produces (reference README.md:54-58's
    streaming ingest, as a REAL Spark connector: offsets in the
    checkpoint log, partition planning, executor-side decode,
    deterministic replay).

    Offset = ``{"n": k}``: the first ``k`` files in (mtime, name)
    order have been consumed. The reader keeps an append-only
    in-memory file ledger so an offset range always maps to the same
    files within a run; after a restart the ledger is rebuilt from the
    directory listing, which is deterministic under the landing-zone
    convention this source requires (files land atomically — write
    temp + rename — and are immutable afterwards; Spark's own
    FileStreamSource leans on the same convention). Each file becomes
    one input partition, decoded on executors through the identical
    split machinery as the batch reader — a 100 TB backlog fans out
    across the cluster, and ``maxFilesPerBatch`` bounds a micro-batch.
    """

    def __init__(self, spark_schema: T.StructType, options: dict) -> None:
        self.spark_schema = spark_schema
        self.reader_schema_json = options.get("avroschema")
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro stream reader requires a path")
        self.max_files = int(options.get("maxfilesperbatch", 0)) or None
        self._ledger: list[str] = []

    def _list_dir(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        entries = [
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if not f.startswith((".", "_"))
        ]
        return sorted(entries, key=lambda f: (os.path.getmtime(f), f))

    def _extend_ledger(self, upto: Optional[int] = None) -> None:
        seen = set(self._ledger)
        fresh = [f for f in self._list_dir() if f not in seen]
        if upto is not None:
            fresh = fresh[: max(0, upto - len(self._ledger))]
        self._ledger.extend(fresh)

    def initialOffset(self) -> dict:
        return {"n": 0}

    def latestOffset(self) -> dict:
        self._extend_ledger()
        n = len(self._ledger)
        # bound the micro-batch: advance at most maxFilesPerBatch past
        # the furthest point already planned/committed — Spark calls
        # latestOffset once per planning round, so a backlog drains
        # maxFiles per micro-batch. (The floor combines the last
        # planned offset with commit() feedback; after a process
        # restart the first round re-plans from the checkpoint log's
        # offset, so the limit is per-run, like Spark's own ReadLimit.)
        if self.max_files is not None and n > 0:
            floor = max(getattr(self, "_planned", 0), getattr(self, "_committed", 0))
            n = min(n, floor + self.max_files)
            self._planned = n
        return {"n": n}

    def partitions(self, start: dict, end: dict) -> list[AvroSplit]:
        self._extend_ledger(upto=end["n"])
        if end["n"] > len(self._ledger):
            raise RuntimeError(
                f"avro stream: offset {end['n']} beyond the {len(self._ledger)} "
                f"landed files — files were removed from {self.path!r}, which the "
                "landing-zone convention (atomic, immutable) forbids"
            )
        splits = []
        for path in self._ledger[start["n"] : end["n"]]:
            size = os.path.getsize(path)
            with open(path, "rb") as fh:
                header = read_header(fh.read(1 << 16))
            splits.append(
                AvroSplit(
                    path=path,
                    start=0,
                    end=size,
                    schema_json=header.schema_json,
                    codec=header.codec,
                    sync=header.sync,
                    header_len=header.header_len,
                )
            )
        return splits

    def read(self, partition: AvroSplit) -> Iterator[Any]:
        return _decode_split(self.spark_schema, self.reader_schema_json, partition)

    def commit(self, end: dict) -> None:
        self._committed = end["n"]

    def stop(self) -> None:
        pass


def read_avro_stream(
    spark: SparkSession,
    path: str,
    reader_schema: Union[AvroSchema, str, dict, None] = None,
    max_files_per_batch: Optional[int] = None,
) -> DataFrame:
    """Stream Avro container files landing in ``path`` (micro-batch;
    offsets checkpointed; one input partition per file, executor-side
    decode). See :class:`AvroStreamReader` for the landing-zone
    contract."""
    register_avro_datasource(spark)
    reader = spark.readStream.format("avro_py").option("path", path)
    if reader_schema is not None:
        if not isinstance(reader_schema, AvroSchema):
            reader_schema = parse_schema(reader_schema)
        reader = reader.option("avroSchema", json.dumps(reader_schema.to_json()))
    if max_files_per_batch is not None:
        reader = reader.option("maxFilesPerBatch", str(max_files_per_batch))
    return reader.load()


class AvroStreamWriter(DataSourceStreamWriter):
    """Micro-batch streaming SINK: each batch lands as Avro container
    files (one per non-empty partition) under ``path`` — the writer
    half of the landing-zone connector, producing exactly the layout
    :class:`AvroStreamReader` consumes, so engines chain.

    Exactly-once output: tasks stage under dot-prefixed names (readers
    skip dotfiles), ``commit(batchId)`` renames them to deterministic
    ``part-{batchId}-{partition}`` finals — a REPLAYED batch (failure
    after partial commit) overwrites the same final names instead of
    duplicating rows — and ``abort`` removes the staged files.
    """

    def __init__(self, spark_schema: T.StructType, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("avro stream writer requires a path")
        self.codec = options.get("compression", "deflate")
        self.record_name = options.get("recordname", "topLevelRecord")
        self.avro_schema_json = options.get("avroschema")
        self.spark_schema = spark_schema
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator: Iterator[Any]) -> AvroCommit:
        from pyspark import TaskContext

        if self.avro_schema_json:
            schema = parse_schema(self.avro_schema_json)
        else:
            schema = df_schema_to_avro(self.spark_schema, name=self.record_name)
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        staged = os.path.join(self.path, f".staged-{uuid.uuid4().hex[:8]}-{pid:05d}.avro")
        n = 0
        field_names = [f.name for f in self.spark_schema.fields]
        with open(staged, "wb") as fh:
            with ContainerWriter(fh, schema, codec=self.codec) as w:
                for row in iterator:
                    w.append(_row_to_dict(row, field_names))
                    n += 1
        if n == 0:
            os.remove(staged)
            return AvroCommit(file="", rows=0)
        # carry the partition id so commit() can build the
        # deterministic, replay-idempotent final name
        return AvroCommit(file=f"{staged}\x00{pid}", rows=n)

    def commit(self, messages, batchId: int) -> None:  # type: ignore[override]
        for m in messages:
            if m is None or not m.file:
                continue
            staged, pid = m.file.split("\x00")
            final = os.path.join(self.path, f"part-{batchId:08d}-{int(pid):05d}.avro")
            os.replace(staged, final)

    def abort(self, messages, batchId: int) -> None:  # type: ignore[override]
        for m in messages:
            if m is None or not m.file:
                continue
            staged = m.file.split("\x00")[0]
            if os.path.exists(staged):
                os.remove(staged)
