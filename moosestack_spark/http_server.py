"""Thin HTTP front over IngestPipeline + Api (stdlib http.server).

Port targets:
- POST /ingest/{model}[/{version}] — local_webserver.rs:1509-1748
  (handle_json_array_body): Bearer auth -> claims, streaming body-size limit
  (default 10 MB -> 413), JSON array-or-object parse, per-record validation
  with DLQ routing, whole-body parse failure salvages JSON objects into the
  DLQ; routing :1880-1933 resolves a version-less path to the LATEST
  registered version.
- GET /api/{name}[/{version}] — the consumption worker
  (ts-moose-lib/src/consumption-apis/runner.ts:449-504): query params ->
  validated params model -> handler -> JSON rows; JWT claims injected into
  JWT[T] params.

Auth (utilities/auth.rs): `Authorization: Bearer <token>`.  Two modes:
- ``api_key``: constant-time comparison (the reference's hashed-key mode,
  collapsed to a single shared key);
- ``jwt_config``: JWT validation with iss/aud/exp required claims.  The
  reference validates RS256 tokens; RSA needs a crypto lib this container
  lacks, so this implementation supports HS256 (same claims contract, same
  validation rules — the algorithm choice is config, not architecture).

The server is the control-plane edge: every request terminates in the same
library calls the tests drive directly (IngestPipeline.ingest /
Api.call_json), so the HTTP layer adds routing + auth + limits, never new
semantics.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import threading
import time
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qsl, urlsplit

DEFAULT_MAX_BODY = 10 * 1024 * 1024  # local_webserver.rs default_max_request_body_size


def salvage_json_objects(text: str) -> list[dict]:
    """Recover complete JSON objects from an unparseable body
    (local_webserver.rs handle_json_array_body: a whole-body parse failure
    salvages individual objects into the DLQ rather than dropping them)."""
    decoder = json.JSONDecoder()
    out: list[dict] = []
    i = 0
    while True:
        i = text.find("{", i)
        if i == -1:
            return out
        try:
            obj, end = decoder.raw_decode(text, i)
        except json.JSONDecodeError:
            i += 1
            continue
        if isinstance(obj, dict):
            out.append(obj)
        i = end


@dataclass
class JwtConfig:
    """JWT validation config (iss/aud/exp are REQUIRED claims, as in
    utilities/auth.rs create_validation).  Exactly one of `secret` (HS256)
    or `public_key_pem` (RS256 — the reference's algorithm, verified in
    pure Python via rsa_verify.py) must be set; the token's header alg
    must match the configured mode, so an attacker can't downgrade an
    RS256 deployment to HS256-with-the-PEM-as-secret."""

    issuer: str
    audience: str
    secret: Optional[str] = None
    public_key_pem: Optional[str] = None

    def __post_init__(self) -> None:
        if (self.secret is None) == (self.public_key_pem is None):
            raise ValueError("set exactly one of secret / public_key_pem")


def _b64url_decode(seg: str) -> bytes:
    return base64.urlsafe_b64decode(seg + "=" * (-len(seg) % 4))


def decode_jwt(token: str, config: JwtConfig) -> Optional[dict]:
    """Validate signature (HS256 or RS256 per config) + iss/aud/exp;
    return the claims dict or None."""
    try:
        header_b64, payload_b64, sig_b64 = token.split(".")
        header = json.loads(_b64url_decode(header_b64))
        signing_input = f"{header_b64}.{payload_b64}".encode()
        sig = _b64url_decode(sig_b64)
        if config.secret is not None:
            if header.get("alg") != "HS256":
                return None
            expected = hmac.new(
                config.secret.encode(), signing_input, hashlib.sha256
            ).digest()
            if not hmac.compare_digest(expected, sig):
                return None
        else:
            if header.get("alg") != "RS256":
                return None
            from moosestack_spark.rsa_verify import (
                parse_rsa_public_key_pem,
                rsa_verify_pkcs1_sha256,
            )

            n, e = parse_rsa_public_key_pem(config.public_key_pem)
            if not rsa_verify_pkcs1_sha256(signing_input, sig, n, e):
                return None
        claims = json.loads(_b64url_decode(payload_b64))
        if claims.get("iss") != config.issuer:
            return None
        aud = claims.get("aud")
        if aud != config.audience and (
            not isinstance(aud, list) or config.audience not in aud
        ):
            return None
        if "exp" not in claims or float(claims["exp"]) < time.time():
            return None
        return claims
    except Exception:
        return None


# Back-compat alias (HS256 was the only mode before RS256 support landed).
decode_jwt_hs256 = decode_jwt


def encode_jwt_hs256(claims: dict, secret: str) -> str:
    """Test/dev helper: mint an HS256 token for the claims."""

    def enc(obj: dict) -> str:
        return (
            base64.urlsafe_b64encode(json.dumps(obj, separators=(",", ":")).encode())
            .rstrip(b"=")
            .decode()
        )

    head, payload = enc({"alg": "HS256", "typ": "JWT"}), enc(claims)
    sig = hmac.new(secret.encode(), f"{head}.{payload}".encode(), hashlib.sha256).digest()
    return f"{head}.{payload}." + base64.urlsafe_b64encode(sig).rstrip(b"=").decode()


class MooseHttpServer:
    """Route table + server lifecycle.  Pipelines register as
    (name, version) -> IngestPipeline; APIs resolve through api.get_api."""

    def __init__(
        self,
        spark,
        api_key: Optional[str] = None,
        jwt_config: Optional[JwtConfig] = None,
        max_body_bytes: int = DEFAULT_MAX_BODY,
        max_concurrent_requests: Optional[int] = None,
    ):
        """max_concurrent_requests bounds in-flight request handling (the
        reference runs one consumption worker per core,
        consumption-apis/runner.ts:449-504; for a Spark backend the
        equivalent is a bounded admission gate on the shared driver —
        concurrent requests run as parallel Spark jobs, and beyond the
        bound the server sheds load with 503 instead of queueing
        unboundedly).  Default: os.cpu_count(), matching the reference's
        per-core sizing."""
        import os as _os

        self.spark = spark
        self.api_key = api_key
        self.jwt_config = jwt_config
        self.max_body_bytes = max_body_bytes
        self._slots = threading.Semaphore(
            max_concurrent_requests or _os.cpu_count() or 4
        )
        self._pipelines: dict[tuple[str, Optional[str]], object] = {}
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    def add_pipeline(self, pipeline, version: Optional[str] = None) -> None:
        self._pipelines[(pipeline.name, version)] = pipeline

    def _resolve_pipeline(self, name: str, version: Optional[str]):
        if (name, version) in self._pipelines:
            return self._pipelines[(name, version)]
        if version is None:
            # version-less path -> latest registered version.  Key each
            # segment as (kind, value) so "9" and "9b" order without the
            # int-vs-str TypeError a mixed list key would raise.
            versions = sorted(
                (v for (n, v) in self._pipelines if n == name and v is not None),
                key=lambda v: [
                    (0, int(p), "") if p.isdigit() else (1, 0, p)
                    for p in v.split(".")
                ],
            )
            if versions:
                return self._pipelines[(name, versions[-1])]
        return None

    # -- auth ---------------------------------------------------------------

    def _authorize(self, headers) -> tuple[bool, Optional[dict]]:
        """Returns (authorized, jwt_claims)."""
        auth = headers.get("Authorization", "")
        token = auth[len("Bearer ") :] if auth.startswith("Bearer ") else None
        if self.jwt_config is not None:
            claims = decode_jwt(token, self.jwt_config) if token else None
            return claims is not None, claims
        if self.api_key is not None:
            # compare bytes: compare_digest on str raises TypeError for
            # non-ASCII tokens (headers decode latin-1), which would crash
            # the request instead of returning 401
            ok = token is not None and hmac.compare_digest(
                token.encode("utf-8", "surrogateescape"),
                self.api_key.encode("utf-8", "surrogateescape"),
            )
            return ok, None
        return True, None

    # -- lifecycle ----------------------------------------------------------

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # silence test output
                pass

            def _reply(self, code: int, obj) -> None:
                body = json.dumps(obj, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _with_slot(self, inner) -> None:
                # every failure must terminate in an HTTP reply — an
                # uncaught exception here drops the connection with no
                # status, which clients see as an empty reply
                if not server._slots.acquire(blocking=False):
                    try:
                        self._reply(503, {"error": "server at capacity"})
                    except Exception:
                        pass
                    return
                try:
                    inner()
                except Exception as exc:
                    try:
                        self._reply(500, {"error": str(exc)})
                    except Exception:
                        pass
                finally:
                    server._slots.release()

            def do_POST(self) -> None:
                self._with_slot(self._do_post_inner)

            def _do_post_inner(self) -> None:
                parts = [p for p in urlsplit(self.path).path.split("/") if p]
                if len(parts) not in (2, 3) or parts[0] != "ingest":
                    self._reply(404, {"error": "not found"})
                    return
                ok, _claims = server._authorize(self.headers)
                if not ok:
                    self._reply(401, {"error": "unauthorized"})
                    return
                name = parts[1]
                version = parts[2] if len(parts) == 3 else None
                pipeline = server._resolve_pipeline(name, version)
                if pipeline is None:
                    self._reply(404, {"error": f"no ingest route {name!r}"})
                    return
                try:
                    length = int(self.headers.get("Content-Length") or 0)
                except ValueError:
                    self._reply(400, {"error": "invalid Content-Length"})
                    return
                if length > server.max_body_bytes:
                    self._reply(
                        413,
                        {
                            "error": "Request body too large. Maximum size is "
                            f"{server.max_body_bytes} bytes"
                        },
                    )
                    return
                body = self.rfile.read(length)
                try:
                    payload = json.loads(body)
                except (json.JSONDecodeError, UnicodeDecodeError):
                    # whole-body parse failure: salvage complete objects
                    # into the DLQ (handle_json_array_body semantics)
                    salvaged = salvage_json_objects(
                        body.decode("utf-8", "replace")
                    )
                    n = 0
                    if salvaged and hasattr(pipeline, "dead_letter"):
                        n = pipeline.dead_letter(
                            salvaged,
                            error_message="whole-body JSON parse failure",
                            error_type="ParseError",
                        )
                    self._reply(
                        400,
                        {"error": "invalid JSON body", "dead_lettered": n},
                    )
                    return
                if isinstance(payload, dict):
                    records = [payload]
                elif isinstance(payload, list):
                    if not all(isinstance(r, dict) for r in payload):
                        self._reply(400, {"error": "array items must be objects"})
                        return
                    records = payload
                else:
                    self._reply(400, {"error": "body must be object or array"})
                    return
                try:
                    result = pipeline.ingest(records)
                except PermissionError as exc:
                    self._reply(403, {"error": str(exc)})
                    return
                except Exception as exc:  # fail-fast insert error etc.
                    self._reply(500, {"error": str(exc)})
                    return
                self._reply(200, result)

            def do_GET(self) -> None:
                self._with_slot(self._do_get_inner)

            def _do_get_inner(self) -> None:
                from moosestack_spark.api import get_api, openapi_spec

                url = urlsplit(self.path)
                parts = [p for p in url.path.split("/") if p]
                if parts == ["openapi.json"]:
                    # spec of the registered consumption APIs (the
                    # reference's moose-dev openapi.yaml, served live)
                    ok, _claims = server._authorize(self.headers)
                    if not ok:
                        self._reply(401, {"error": "unauthorized"})
                        return
                    self._reply(200, openapi_spec())
                    return
                if len(parts) not in (2, 3) or parts[0] != "api":
                    self._reply(404, {"error": "not found"})
                    return
                ok, claims = server._authorize(self.headers)
                if not ok:
                    self._reply(401, {"error": "unauthorized"})
                    return
                name = parts[1]
                version = parts[2] if len(parts) == 3 else None
                try:
                    api = get_api(name, version)
                except KeyError:
                    self._reply(404, {"error": f"no api {name!r}"})
                    return
                params = dict(parse_qsl(url.query))
                try:
                    rows = api.call_json(server.spark, jwt=claims, **params)
                except PermissionError as exc:
                    self._reply(401, {"error": str(exc)})
                    return
                except Exception as exc:  # pydantic ValidationError etc.
                    self._reply(400, {"error": str(exc)})
                    return
                self._reply(200, rows)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
