"""Pure-Python, spec-based Avro codec (Avro 1.12 specification).

Implements the data model of the reference's vendored library
(/root/reference/python-udf/avro/, ~4,400 LoC) from the public Avro
specification — schema parsing (schema.py:1249-1394), binary
encode/decode (io.py), the Object Container File format (datafile.py),
block codecs (codecs.py), schema resolution (io.py:678-702) and the
compatibility checker (compatibility.py:140-319) — with the *intended*
spec semantics, not the port's latent bugs (SURVEY.md Appendix A).
"""

from .schema_model import (  # noqa: F401
    AvroSchema,
    ArraySchema,
    EnumSchema,
    Field,
    FixedSchema,
    MapSchema,
    PrimitiveSchema,
    RecordSchema,
    SchemaParseError,
    UnionSchema,
    canonical_form,
    fingerprint64,
    parse_schema,
)
from .binary import (  # noqa: F401
    AvroDecodeError,
    AvroEncodeError,
    BinaryReader,
    BinaryWriter,
    SchemaResolutionError,
    compile_decoder,
    compile_encoder,
    compile_resolver,
    compile_skipper,
    decode_datum,
    encode_datum,
)
from .container import (  # noqa: F401
    MAGIC,
    SYNC_SIZE,
    ContainerHeader,
    ContainerReader,
    ContainerWriter,
    iter_container,
    read_header,
    write_container,
)
from .block_codecs import UnsupportedCodec, get_codec, list_codecs  # noqa: F401
from .compat import (  # noqa: F401
    CompatibilityResult,
    Incompatibility,
    check_reader_writer,
    is_compatible,
)
from .convert import avro_to_spark_type, spark_type_to_avro  # noqa: F401
from .jsonio import datum_to_jsonable, datum_to_json, jsonable_to_datum  # noqa: F401
