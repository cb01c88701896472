"""Schema registries: pluggable schema-by-key lookup.

Reference parity (SURVEY §2.1 S4/S5):

- Glue Schema Registry: schema by STREAM NAME, latest version, LRU(32)
  cache (glue-schema-per-stream-udf/lambda_function.py:14-27).
- Spring Cloud Schema Registry: schema by CONTENT TYPE
  ``application/vnd.<schema>.v<n>+avro`` →
  ``https://<host>/services/avro-schema-registry/<schema>/<format>/<version>``,
  response JSON's ``definition`` field, memoized dict
  (springcloud-lambda-udf/lambda_function.py:18-69).

Architecture difference from the reference: registries are DRIVER-side
only. Executors never talk to a registry — the driver fetches once and
the schema JSON travels to tasks inside the UDF closure (equivalent of
a broadcast; SURVEY §3 boundary analysis). External clients (boto3 /
HTTP) are import-guarded; an in-memory registry serves tests exactly
like the reference's cached-dict pattern.
"""

from __future__ import annotations

import json
from functools import lru_cache
from typing import Callable, Optional, Protocol, Union

from ..avroio.schema_model import AvroSchema, parse_schema

DEFAULT_SPRING_URL_FORMAT = (
    "https://{host}/services/avro-schema-registry/{schema}/{format}/{version}"
)


class SchemaRegistry(Protocol):
    """Anything that resolves a key (stream name / content type / subject)
    to a parsed Avro schema."""

    def get_schema(self, key: str) -> AvroSchema: ...


class InMemorySchemaRegistry:
    """Static dict registry — the test double the reference effectively
    uses once its HTTP cache is warm."""

    def __init__(self, schemas: dict[str, Union[AvroSchema, str, dict]]) -> None:
        self._schemas: dict[str, AvroSchema] = {
            k: (v if isinstance(v, AvroSchema) else parse_schema(v))
            for k, v in schemas.items()
        }

    def get_schema(self, key: str) -> AvroSchema:
        try:
            return self._schemas[key]
        except KeyError:
            raise KeyError(f"no schema registered for {key!r}") from None

    def register(self, key: str, schema: Union[AvroSchema, str, dict]) -> None:
        self._schemas[key] = schema if isinstance(schema, AvroSchema) else parse_schema(schema)


class GlueSchemaRegistry:
    """Schema by stream name, latest version (reference
    glue-schema-per-stream-udf/lambda_function.py:14-27).

    ``client`` is a boto3 glue client; injectable for tests. Cached with
    lru_cache(32) for parity with the reference."""

    def __init__(self, registry_name: str = "default-registry", client=None) -> None:
        if client is None:
            try:
                import boto3  # type: ignore[import-not-found]
            except ImportError as exc:  # pragma: no cover - boto3 not in runtime
                raise ImportError(
                    "GlueSchemaRegistry needs boto3 (not in this runtime); "
                    "pass client= or use InMemorySchemaRegistry"
                ) from exc
            client = boto3.client("glue")
        self._client = client
        self._registry_name = registry_name
        self._cached = lru_cache(maxsize=32)(self._fetch)

    def _fetch(self, stream_name: str) -> AvroSchema:
        resp = self._client.get_schema_version(
            SchemaId={
                "RegistryName": self._registry_name,
                "SchemaName": stream_name,
            },
            SchemaVersionNumber={"LatestVersion": True},
        )
        return parse_schema(resp["SchemaDefinition"])

    def get_schema(self, key: str) -> AvroSchema:
        return self._cached(key)


def parse_spring_content_type(content_type: str) -> tuple[str, str, str]:
    """``application/vnd.person.v1+avro`` → (schema, version, format).

    Mirrors the reference's URL mapping (springcloud-lambda-udf/
    lambda_function.py:28-37, test at 262-266): version keeps its ``v``
    prefix, format comes from the ``+`` suffix.
    """
    _, _, rest = content_type.partition("/")
    parts = rest.split(".")
    if len(parts) != 3:
        raise ValueError(f"unparseable content type: {content_type!r}")
    _, schema, version_fmt = parts
    version, _, fmt = version_fmt.partition("+")
    if not schema or not version or not fmt:
        raise ValueError(f"unparseable content type: {content_type!r}")
    return schema, version, fmt


def spring_registry_url(
    content_type: str, host: str, url_format: str = DEFAULT_SPRING_URL_FORMAT
) -> str:
    schema, version, fmt = parse_spring_content_type(content_type)
    return url_format.format(host=host, schema=schema, format=fmt, version=version)


class SpringSchemaRegistry:
    """Spring Cloud Schema Registry client (reference
    springcloud-lambda-udf/lambda_function.py:18-69).

    ``fetch`` is injectable: ``fetch(url) -> response text``. The default
    uses urllib (stdlib). Responses are memoized per schema id, like the
    reference's ``_schemas`` dict.
    """

    def __init__(
        self,
        host: str,
        url_format: str = DEFAULT_SPRING_URL_FORMAT,
        fetch: Optional[Callable[[str], str]] = None,
    ) -> None:
        self._host = host
        self._url_format = url_format
        self._fetch = fetch if fetch is not None else self._http_fetch
        self._schemas: dict[str, AvroSchema] = {}

    @staticmethod
    def _http_fetch(url: str) -> str:  # pragma: no cover - needs network
        from urllib.request import urlopen

        with urlopen(url) as resp:
            return resp.read().decode("utf-8")

    def url_for(self, content_type: str) -> str:
        return spring_registry_url(content_type, self._host, self._url_format)

    def get_schema(self, key: str) -> AvroSchema:
        if key not in self._schemas:
            text = self._fetch(self.url_for(key))
            self._schemas[key] = parse_schema(json.loads(text)["definition"])
        return self._schemas[key]
