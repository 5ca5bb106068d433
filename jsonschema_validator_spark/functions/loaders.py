"""Schema-document loaders for $ref resolution across files.

The reference resolves remote/base URIs through a pluggable loader with
a fetch-and-cache contract (scope_builder.rs:33-41
``retrieve_schema`` -> ``get_or_fetch_with_result``; mocked remote
loading exercised at ref_.rs:136-194). The Spark engine's analog is the
``Scope.loader`` hook: any callable ``uri -> raw schema document``.
Fetched documents are cached in ``Scope.registry`` so each URI is read
and parsed once per compile.

``file_loader`` is the shared-spec-suite loader (SURVEY §5.3): it
serves ``file://`` URIs (and bare paths) from disk, optionally jailed
to a root directory so a spec cannot ``$ref`` its way out of its suite
folder.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from urllib.parse import unquote, urlsplit

from ..errors import RefResolutionError

__all__ = ["file_loader", "http_loader", "default_loader", "registry_from_dir"]


def file_loader(root_dir: str | Path | None = None):
    """Loader serving ``file://`` URIs (or scheme-less paths) from disk.

    root_dir, when given, jails resolution: any URI whose real path
    escapes it raises RefResolutionError (a ../-laden $ref must not read
    arbitrary files)."""
    root = Path(root_dir).resolve() if root_dir is not None else None

    def load(uri: str):
        parts = urlsplit(uri)
        if parts.scheme not in ("", "file"):
            raise RefResolutionError(f"file_loader cannot serve scheme {parts.scheme!r} ({uri})")
        path = Path(unquote(parts.path if parts.scheme == "file" else uri))
        resolved = path.resolve()
        if root is not None and root not in resolved.parents and resolved != root:
            raise RefResolutionError(f"$ref escapes spec root {root}: {uri}")
        if not resolved.is_file():
            raise RefResolutionError(f"$ref target does not exist: {uri}")
        return json.loads(resolved.read_text())

    return load


def http_loader(
    allowed_schemes: tuple[str, ...] = ("https",),
    timeout: float = 10.0,
    max_bytes: int = 8 * 1024 * 1024,
    retries: int = 2,
    backoff: float = 0.25,
):
    """Production remote-schema fetcher — the engine analog of the
    reference's HTTP ``$ref`` retrieval (ref_.rs:136-194; loader contract
    scope_builder.rs:33-41). urllib-based (stdlib only), with:

    - scheme allow-list (``https`` only by default; pass
      ``("http", "https")`` to also permit cleartext),
    - per-request timeout,
    - response size cap (a ``$ref`` must not OOM the driver),
    - bounded retries with exponential backoff for transient failures
      (5xx / connection errors); 4xx fails immediately — a 404 schema
      will not appear on retry.

    Every failure surfaces as :class:`RefResolutionError` at COMPILE
    time (fetches happen during ``compile_schema``, driver-side, never
    per row). Fetch-once caching is the ``Scope.registry``'s job — each
    URI is requested at most once per compile, and pre-seeding the
    registry skips the network entirely."""
    import urllib.error
    import urllib.request

    def load(uri: str):
        parts = urlsplit(uri)
        if parts.scheme not in allowed_schemes:
            raise RefResolutionError(
                f"http_loader: scheme {parts.scheme!r} not in allow-list "
                f"{allowed_schemes} ({uri})"
            )
        last: Exception | None = None
        for attempt in range(retries + 1):
            if attempt:
                time.sleep(backoff * (2 ** (attempt - 1)))
            try:
                req = urllib.request.Request(
                    uri,
                    headers={"Accept": "application/schema+json, application/json"},
                )
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    data = resp.read(max_bytes + 1)
                if len(data) > max_bytes:
                    raise RefResolutionError(
                        f"$ref document exceeds {max_bytes} bytes: {uri}"
                    )
                try:
                    return json.loads(data)
                except ValueError as e:
                    raise RefResolutionError(f"$ref target is not JSON: {uri} ({e})")
            except RefResolutionError:
                raise
            except urllib.error.HTTPError as e:
                last = e
                if 400 <= e.code < 500:
                    break  # deterministic failure — retrying can't help
            except (urllib.error.URLError, TimeoutError, OSError) as e:
                last = e
        raise RefResolutionError(f"$ref fetch failed for {uri}: {last!r}")

    return load


def default_loader(
    root_dir: str | Path | None = None,
    allowed_schemes: tuple[str, ...] = ("https",),
    **http_kw,
):
    """Scheme-dispatching loader: ``file://``/bare paths go to
    :func:`file_loader` (jailed to ``root_dir`` when given), http(s) to
    :func:`http_loader` — one hook serving a spec suite that mixes local
    siblings with published remote schemas."""
    floader = file_loader(root_dir)
    hloader = http_loader(allowed_schemes=allowed_schemes, **http_kw)

    def load(uri: str):
        scheme = urlsplit(uri).scheme
        return hloader(uri) if scheme in ("http", "https") else floader(uri)

    return load


def registry_from_dir(spec_dir: str | Path) -> dict[str, object]:
    """Eagerly load every ``*.json`` in a directory as ``file://`` docs —
    convenient for tests and for shipping a whole spec suite to
    executors without touching the filesystem at compile time."""
    out: dict[str, object] = {}
    for p in sorted(Path(spec_dir).glob("*.json")):
        out[p.resolve().as_uri()] = json.loads(p.read_text())
    return out
