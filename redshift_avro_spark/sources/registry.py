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


class GlueHttpClient:
    """boto3-free AWS Glue client for the one call the reference makes:
    ``GetSchemaVersion`` (glue-schema-per-stream-udf/
    lambda_function.py:20-26), speaking the service's public wire
    protocol directly — an ``application/x-amz-json-1.1`` POST with
    ``X-Amz-Target: AWSGlue.GetSchemaVersion`` and a SigV4-signed
    Authorization header (both documented in the AWS API reference).

    Exists so the Glue request/response plumbing is EXECUTABLE in
    environments without boto3: point ``endpoint_url`` at an
    in-process HTTP server (tests/test_registry_http.py's fake Glue
    recomputes the SigV4 signature from the shared secret and rejects
    a bad one) exactly as the Spring registry is exercised. Against
    real AWS it needs only genuine credentials — the signing algorithm
    is the standard one."""

    def __init__(
        self,
        endpoint_url: str,
        region: str = "us-east-1",
        access_key: str = "test",
        secret_key: str = "test",
        fetch: Optional[Callable[..., str]] = None,
    ) -> None:
        self._endpoint = endpoint_url.rstrip("/") + "/"
        self._region = region
        self._access_key = access_key
        self._secret_key = secret_key
        self._fetch = fetch if fetch is not None else self._http_post

    # -- SigV4 (public algorithm, AWS General Reference "Signature v4") --
    def _sign(self, amz_date: str, headers: dict, body: bytes) -> str:
        import hashlib
        import hmac
        from urllib.parse import urlparse

        def hm(key: bytes, msg: str) -> bytes:
            return hmac.new(key, msg.encode(), hashlib.sha256).digest()

        datestamp = amz_date[:8]
        scope = f"{datestamp}/{self._region}/glue/aws4_request"
        signed = ";".join(sorted(k.lower() for k in headers))
        canonical_headers = "".join(
            f"{k.lower()}:{headers[k].strip()}\n" for k in sorted(headers, key=str.lower)
        )
        payload_hash = hashlib.sha256(body).hexdigest()
        path = urlparse(self._endpoint).path or "/"
        canonical = f"POST\n{path}\n\n{canonical_headers}\n{signed}\n{payload_hash}"
        to_sign = (
            f"AWS4-HMAC-SHA256\n{amz_date}\n{scope}\n"
            + hashlib.sha256(canonical.encode()).hexdigest()
        )
        key = hm(hm(hm(hm(b"AWS4" + self._secret_key.encode(), datestamp), self._region), "glue"), "aws4_request")
        signature = hmac.new(key, to_sign.encode(), hashlib.sha256).hexdigest()
        return (
            f"AWS4-HMAC-SHA256 Credential={self._access_key}/{scope}, "
            f"SignedHeaders={signed}, Signature={signature}"
        )

    def _request(self, target: str, payload: dict) -> tuple[str, dict, bytes]:
        import datetime as _dt
        from urllib.parse import urlparse

        body = json.dumps(payload).encode()
        amz_date = _dt.datetime.now(_dt.timezone.utc).strftime("%Y%m%dT%H%M%SZ")
        headers = {
            "Host": urlparse(self._endpoint).netloc,
            "X-Amz-Date": amz_date,
            "X-Amz-Target": target,
            "Content-Type": "application/x-amz-json-1.1",
        }
        headers["Authorization"] = self._sign(
            amz_date, {k: v for k, v in headers.items() if k != "Authorization"}, body
        )
        return self._endpoint, headers, body

    @staticmethod
    def _http_post(url: str, headers: dict, body: bytes) -> str:
        from urllib.request import Request, urlopen

        with urlopen(Request(url, data=body, headers=headers, method="POST")) as resp:
            return resp.read().decode("utf-8")

    def get_schema_version(self, SchemaId: dict, SchemaVersionNumber: dict) -> dict:  # noqa: N803 — boto3 parity
        url, headers, body = self._request(
            "AWSGlue.GetSchemaVersion",
            {"SchemaId": SchemaId, "SchemaVersionNumber": SchemaVersionNumber},
        )
        return json.loads(self._fetch(url, headers, body))


class GlueSchemaRegistry:
    """Schema by stream name, latest version (reference
    glue-schema-per-stream-udf/lambda_function.py:14-27).

    ``client`` is a boto3 glue client (or :class:`GlueHttpClient`,
    built automatically when ``endpoint_url`` is given — the boto3-free
    wire path). Cached with lru_cache(32) for parity with the
    reference."""

    def __init__(
        self,
        registry_name: str = "default-registry",
        client=None,
        endpoint_url: Optional[str] = None,
        **http_kwargs,
    ) -> None:
        if client is None and endpoint_url is not None:
            client = GlueHttpClient(endpoint_url, **http_kwargs)
        elif client is None:
            try:
                import boto3  # type: ignore[import-not-found]
            except ImportError as exc:  # pragma: no cover - boto3 not in runtime
                raise ImportError(
                    "GlueSchemaRegistry needs boto3 (not in this runtime); "
                    "pass client=, endpoint_url=, or use InMemorySchemaRegistry"
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
