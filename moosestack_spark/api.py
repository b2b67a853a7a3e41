"""Consumption API layer: typed query endpoints (SURVEY.md §3.3).

Port target: packages/py-moose-lib/moose_lib/dmv2/consumption.py:62 (Api[T,U])
and ts-moose-lib/src/consumption-apis + runner.ts:249-255 — the user function
is invoked as fn(params, utils) where utils carries the sql client.

Spark mapping: a registered Python function (params: pydantic model) ->
DataFrame; execution is spark.sql / DataFrame ops; the HTTP front is out of
scope (any ASGI wrapper can serve `.call(...)`), the semantics live here:
param validation, registry + versioning, result shaping.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Generic, Optional, TypeVar

from pydantic import BaseModel
from pyspark.sql import DataFrame, SparkSession

TParams = TypeVar("TParams", bound=BaseModel)

_API_REGISTRY: dict[tuple[str, Optional[str]], "Api"] = {}


@dataclass
class ApiUtils:
    """The utils object handed to handlers (runner.ts:249-255): Spark handle,
    sql tag, and the request JWT claims."""

    spark: SparkSession
    jwt: Optional[dict] = None

    def sql(self, *pieces: Any) -> DataFrame:
        from moosestack_spark.sql.template import run, sql

        return run(self.spark, sql(*pieces))


class Api(Generic[TParams]):
    """Api[T, U]: params model + handler returning a DataFrame.

    Handlers receive validated params (Pydantic — same validation the
    reference gets from its param model) and ApiUtils.
    """

    def __init__(
        self,
        name: str,
        params_model: type[TParams],
        handler: Callable[[TParams, ApiUtils], DataFrame],
        version: Optional[str] = None,
    ):
        self.name = name
        self.params_model = params_model
        self.handler = handler
        self.version = version
        key = (name, version)
        if key in _API_REGISTRY:
            raise ValueError(f"api {name!r} version {version!r} already registered")
        _API_REGISTRY[key] = self

    def call(
        self,
        spark: SparkSession,
        jwt: Optional[dict] = None,
        **raw_params: Any,
    ) -> DataFrame:
        # JWT[T]-annotated params come ONLY from the verified token
        # (data_models.py:27, :321-324): a caller-supplied query param can
        # never spoof them — the claim value always overwrites.
        from moosestack_spark.datamodel.reflection import to_columns

        for col in to_columns(self.params_model):
            if not col.annotations.get("jwt"):
                continue
            if jwt is None or col.name not in jwt:
                raise PermissionError(
                    f"api {self.name!r}: param {col.name!r} is JWT-injected "
                    "but the request carries no such claim"
                )
            raw_params[col.name] = jwt[col.name]
        params = self.params_model(**raw_params)  # validation boundary
        return self.handler(params, ApiUtils(spark, jwt=jwt))

    def call_json(
        self,
        spark: SparkSession,
        jwt: Optional[dict] = None,
        limit: Optional[int] = None,
        **raw_params: Any,
    ) -> list[dict]:
        """The HTTP-response shape (rows as dicts).

        Every consumption read is clamped before collect (the reference
        clamps at the query layer, query-model.ts:394,789: request default
        100, maxLimit 1000) — a handler returning an unbounded DataFrame
        must not be able to OOM the serving driver.  `limit` lets a caller
        raise the row count up to MAX_LIMIT; handlers that already limit
        tighter are unaffected."""
        from moosestack_spark.query_layer.pagination import clamp_limit

        n = clamp_limit(limit)
        # a handler whose params model declares its own `limit` still gets
        # it (the response clamp applies on top, never widening)
        # forward the CLAMPED limit: a params model that validates its own
        # bound (e.g. le=1000) must see clamp-and-serve, not a
        # ValidationError on an oversized request
        if limit is not None and "limit" in self.params_model.model_fields:
            raw_params.setdefault("limit", n)
        return [
            r.asDict(recursive=True)
            for r in self.call(spark, jwt=jwt, **raw_params).limit(n).collect()
        ]


def get_api(name: str, version: Optional[str] = None) -> Api:
    """Route/version resolution (runner.ts:163-237): exact version match,
    else the unversioned registration."""
    if (name, version) in _API_REGISTRY:
        return _API_REGISTRY[(name, version)]
    if version is not None and (name, None) in _API_REGISTRY:
        return _API_REGISTRY[(name, None)]
    raise KeyError(f"no api {name!r} (version {version!r})")


def clear_apis() -> None:
    _API_REGISTRY.clear()


def openapi_spec(title: str = "moosestack-spark", version: str = "1.0.0") -> dict:
    """OpenAPI 3.1 document over the registered consumption APIs (the
    reference generates one via `moose dev`'s openapi.yaml emitter,
    apps/framework-cli openapi.rs).  Each Api becomes GET
    /api/{name}[/{version}] with its pydantic params as query parameters
    (schemas via model_json_schema — same JSON-Schema dialect OpenAPI 3.1
    uses natively)."""
    paths: dict = {}
    for (name, ver), api in sorted(
        _API_REGISTRY.items(), key=lambda kv: (kv[0][0], kv[0][1] or "")
    ):
        schema = api.params_model.model_json_schema()
        required = set(schema.get("required", []))
        params = [
            {
                "name": pname,
                "in": "query",
                "required": pname in required,
                "schema": {
                    k: v for k, v in pschema.items() if k not in ("title",)
                },
            }
            for pname, pschema in schema.get("properties", {}).items()
        ]
        route = f"/api/{name}" if ver is None else f"/api/{name}/{ver}"
        paths[route] = {
            "get": {
                "operationId": name if ver is None else f"{name}_{ver}",
                "parameters": params,
                "responses": {
                    "200": {
                        "description": "query result rows",
                        "content": {"application/json": {"schema": {"type": "array"}}},
                    },
                    "400": {"description": "parameter validation failure"},
                    "401": {"description": "unauthorized"},
                },
            }
        }
    return {
        "openapi": "3.1.0",
        "info": {"title": title, "version": version},
        "paths": paths,
    }
