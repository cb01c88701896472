"""GlueSchemaRegistry end-to-end over the real wire path (no boto3).

Mirrors the Spring registry's in-process-server test: a fake Glue
endpoint speaks the public ``application/x-amz-json-1.1`` protocol,
RECOMPUTES the SigV4 signature from the shared secret (rejecting the
request on mismatch — so the client's canonicalization and HMAC chain
are genuinely verified, not just echoed), and serves GetSchemaVersion
responses. No mocks at the parse layer: urllib POST → status/headers →
JSON body → parse_schema, exactly the production path.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from redshift_avro_spark.sources.registry import GlueHttpClient, GlueSchemaRegistry

EVENT_SCHEMA = {
    "type": "record",
    "name": "Event",
    "namespace": "engine.events",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "event_type", "type": "string"},
    ],
}

SECRET = "test-secret"
ACCESS = "AKIDEXAMPLE"
REGION = "eu-west-1"


def _expected_signature(headers, body: bytes) -> str:
    """Independent SigV4 recomputation (AWS General Reference
    algorithm) from the request the server actually received."""
    amz_date = headers["X-Amz-Date"]
    datestamp = amz_date[:8]
    scope = f"{datestamp}/{REGION}/glue/aws4_request"
    names = ["Content-Type", "Host", "X-Amz-Date", "X-Amz-Target"]
    signed = ";".join(n.lower() for n in names)
    canonical_headers = "".join(f"{n.lower()}:{headers[n].strip()}\n" for n in names)
    canonical = (
        f"POST\n/\n\n{canonical_headers}\n{signed}\n{hashlib.sha256(body).hexdigest()}"
    )
    to_sign = (
        f"AWS4-HMAC-SHA256\n{amz_date}\n{scope}\n"
        + hashlib.sha256(canonical.encode()).hexdigest()
    )

    def hm(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    key = hm(hm(hm(hm(b"AWS4" + SECRET.encode(), datestamp), REGION), "glue"), "aws4_request")
    return hmac.new(key, to_sign.encode(), hashlib.sha256).hexdigest()


class _FakeGlue(BaseHTTPRequestHandler):
    requests: list = []

    def do_POST(self):  # noqa: N802 - http.server API
        body = self.rfile.read(int(self.headers["Content-Length"]))
        type(self).requests.append((dict(self.headers), body))
        auth = self.headers.get("Authorization", "")
        want = _expected_signature(self.headers, body)
        if f"Signature={want}" not in auth or f"Credential={ACCESS}/" not in auth:
            self.send_response(403)
            self.end_headers()
            self.wfile.write(b'{"__type":"IncompleteSignatureException"}')
            return
        if self.headers.get("X-Amz-Target") != "AWSGlue.GetSchemaVersion":
            self.send_response(400)
            self.end_headers()
            return
        payload = json.loads(body)
        name = payload["SchemaId"]["SchemaName"]
        resp = json.dumps(
            {
                "SchemaDefinition": json.dumps(EVENT_SCHEMA),
                "SchemaVersionId": f"v-{name}",
                "VersionNumber": 1,
                "Status": "AVAILABLE",
            }
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/x-amz-json-1.1")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def log_message(self, *a):
        return


@pytest.fixture()
def fake_glue():
    _FakeGlue.requests = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeGlue)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}/"
    finally:
        srv.shutdown()
        srv.server_close()


def test_glue_registry_end_to_end_signed(fake_glue):
    reg = GlueSchemaRegistry(
        registry_name="default-registry",
        endpoint_url=fake_glue,
        region=REGION,
        access_key=ACCESS,
        secret_key=SECRET,
    )
    s1 = reg.get_schema("my-stream")
    s2 = reg.get_schema("my-stream")
    assert s1 is s2  # lru(32) cache, reference parity
    assert s1.fullname == "engine.events.Event"
    assert len(_FakeGlue.requests) == 1  # one real wire round trip
    headers, body = _FakeGlue.requests[0]
    assert headers["X-Amz-Target"] == "AWSGlue.GetSchemaVersion"
    assert headers["Content-Type"] == "application/x-amz-json-1.1"
    payload = json.loads(body)
    # the exact boto3-call shape the reference uses (lambda_function.py:20-26)
    assert payload == {
        "SchemaId": {"RegistryName": "default-registry", "SchemaName": "my-stream"},
        "SchemaVersionNumber": {"LatestVersion": True},
    }


def test_glue_bad_signature_rejected(fake_glue):
    from urllib.error import HTTPError

    client = GlueHttpClient(
        fake_glue, region=REGION, access_key=ACCESS, secret_key="WRONG-secret"
    )
    reg = GlueSchemaRegistry(client=client)
    with pytest.raises(HTTPError):
        reg.get_schema("my-stream")
