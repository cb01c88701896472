"""``python -m redshift_avro_spark.tool`` — container-file inspection CLI.

Covers the reference CLI's computable surface (python-udf/avro/
tool.py:104-139: the ``dump`` subcommand prints one repr per datum; its
rpcsend/rpcreceive siblings belong to the dead RPC layer, out of scope
per SURVEY §2.8). Adds the two inspection views a Spark operator keeps
reaching for anyway:

    dump <file.avro> [--limit N] [--json]   one datum per line
    schema <file.avro>                      embedded writer schema JSON
    meta <file.avro>                        header metadata (codec, sync, counts)
    kafka-dump --port P --topic T           records from a broker, JSON per line
    kinesis-dump --endpoint U --stream S    records from a stream, JSON per line

Pure driver-side avroio / wire clients — no SparkSession; for
distributed reads use ``read_avro(spark, path)`` /
``read_kafka_ranges`` / ``read_kinesis_shards``.
"""

from __future__ import annotations

import argparse
import json
import sys

from .avroio.container import iter_container, iter_raw_blocks, read_header
from .avroio.jsonio import datum_to_json


def _read(path: str) -> bytes:
    with open(path, "rb") as fh:
        return fh.read()


def main_dump(args: argparse.Namespace) -> int:
    data = _read(args.input_file)
    for i, datum in enumerate(iter_container(data)):
        if args.limit is not None and i >= args.limit:
            break
        # --json gives the K1 json.dumps contract; default matches the
        # reference's repr-per-line dump
        print(datum_to_json(datum) if args.json else f"{datum!r}")
    return 0


def main_schema(args: argparse.Namespace) -> int:
    header = read_header(_read(args.input_file))
    print(json.dumps(header.schema.to_json(), indent=2))
    return 0


def main_meta(args: argparse.Namespace) -> int:
    data = _read(args.input_file)
    header = read_header(data)
    n_blocks = 0
    n_records = 0
    for count, _payload in iter_raw_blocks(data, header.header_len, header.sync):
        n_blocks += 1
        n_records += count
    print(
        json.dumps(
            {
                "codec": header.codec,
                "sync": header.sync.hex(),
                "header_len": header.header_len,
                "file_len": len(data),
                "blocks": n_blocks,
                "records": n_records,
                "schema_name": header.schema.fullname,
            },
            indent=2,
        )
    )
    return 0


def main_kafka_dump(args: argparse.Namespace) -> int:
    """One JSON line per record: {partition, offset, key?, value} —
    values hex-encoded (they are arbitrary bytes; pipe through the
    decode chain for Avro payloads)."""
    from .sources.kafka_wire import KafkaWireClient, plan_offset_ranges

    ranges = plan_offset_ranges(args.host, args.port, args.topic)
    printed = 0
    with KafkaWireClient(args.host, args.port) as c:
        for partition, start, end in ranges:
            for offset, key, value in c.consume_range(args.topic, partition, start, end):
                if args.limit is not None and printed >= args.limit:
                    return 0
                print(
                    json.dumps(
                        {
                            "partition": partition,
                            "offset": offset,
                            "key": key.hex() if key is not None else None,
                            "value": value.hex() if value is not None else None,
                        }
                    )
                )
                printed += 1
    return 0


def main_kinesis_dump(args: argparse.Namespace) -> int:
    """One JSON line per record: {shard_id, sequence_number,
    partition_key, data} — data hex-encoded."""
    from .sources.kinesis_wire import KinesisHttpClient

    c = KinesisHttpClient(args.endpoint)
    printed = 0
    for shard in c.list_shards(args.stream):
        for seq, pk, data in c.consume_shard(args.stream, shard):
            if args.limit is not None and printed >= args.limit:
                return 0
            print(
                json.dumps(
                    {
                        "shard_id": shard,
                        "sequence_number": seq,
                        "partition_key": pk,
                        "data": data.hex(),
                    }
                )
            )
            printed += 1
    return 0


def _parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(prog="python -m redshift_avro_spark.tool")
    sub = parser.add_subparsers(required=True, dest="command")
    p_dump = sub.add_parser("dump", help="dump an Avro container file")
    p_dump.add_argument("input_file")
    p_dump.add_argument("--limit", type=int, default=None)
    p_dump.add_argument("--json", action="store_true", help="JSON per line instead of repr")
    p_schema = sub.add_parser("schema", help="print the embedded writer schema")
    p_schema.add_argument("input_file")
    p_meta = sub.add_parser("meta", help="print header metadata and block stats")
    p_meta.add_argument("input_file")
    p_kafka = sub.add_parser("kafka-dump", help="dump a Kafka topic via the wire client")
    p_kafka.add_argument("--host", default="127.0.0.1")
    p_kafka.add_argument("--port", type=int, required=True)
    p_kafka.add_argument("--topic", required=True)
    p_kafka.add_argument("--limit", type=int, default=None)
    p_kin = sub.add_parser(
        "kinesis-dump", help="dump a Kinesis stream via the wire client"
    )
    p_kin.add_argument("--endpoint", required=True)
    p_kin.add_argument("--stream", required=True)
    p_kin.add_argument("--limit", type=int, default=None)
    return parser.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = _parse_args(argv)
    return {
        "dump": main_dump,
        "schema": main_schema,
        "meta": main_meta,
        "kafka-dump": main_kafka_dump,
        "kinesis-dump": main_kinesis_dump,
    }[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
