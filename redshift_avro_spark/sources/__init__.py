"""Spark integration: column codecs, file source/sink, registries,
streaming envelopes, and the Redshift UDF batch protocol."""

from .columns import (  # noqa: F401
    decode_container,
    decode_container_json,
    from_avro,
    from_hex,
    infer_container_struct,
    to_avro,
    to_hex,
)
from .files import read_avro, register_avro_datasource, write_avro  # noqa: F401
from .registry import (  # noqa: F401
    GlueSchemaRegistry,
    InMemorySchemaRegistry,
    SchemaRegistry,
    SpringSchemaRegistry,
    parse_spring_content_type,
    spring_registry_url,
)
from .envelopes import (  # noqa: F401
    decode_kpl_aggregate,
    explode_kpl,
    extract_spring_headers,
    parse_spring_message,
    spring_headers_udf,
)
from .redshift_udf import (  # noqa: F401
    container_file_handler,
    make_lambda_handler,
    registry_datum_handler,
    spring_kpl_handler,
)
