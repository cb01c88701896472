"""``python -m redshift_avro_spark.tool`` — container-file inspection CLI.

Covers the reference CLI's computable surface (python-udf/avro/
tool.py:104-139: the ``dump`` subcommand prints one repr per datum; its
rpcsend/rpcreceive siblings belong to the dead RPC layer, out of scope
per SURVEY §2.8). Adds the two inspection views a Spark operator keeps
reaching for anyway:

    dump <file.avro> [--limit N] [--json]   one datum per line
    schema <file.avro>                      embedded writer schema JSON
    meta <file.avro>                        header metadata (codec, sync, counts)

Pure driver-side avroio — no SparkSession; for distributed reads use
``read_avro(spark, path)``.
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
    return parser.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = _parse_args(argv)
    return {"dump": main_dump, "schema": main_schema, "meta": main_meta}[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
