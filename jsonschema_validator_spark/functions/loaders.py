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
from pathlib import Path
from urllib.parse import unquote, urlsplit

from ..errors import RefResolutionError

__all__ = ["file_loader", "registry_from_dir"]


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


def registry_from_dir(spec_dir: str | Path) -> dict[str, object]:
    """Eagerly load every ``*.json`` in a directory as ``file://`` docs —
    convenient for tests and for shipping a whole spec suite to
    executors without touching the filesystem at compile time."""
    out: dict[str, object] = {}
    for p in sorted(Path(spec_dir).glob("*.json")):
        out[p.resolve().as_uri()] = json.loads(p.read_text())
    return out
