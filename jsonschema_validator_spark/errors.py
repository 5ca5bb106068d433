"""Compile-time error taxonomy.

Mirrors the reference's SchemaError enum
(/root/reference/src/types/schema_error.rs:7-18): malformed *schemas* fail
at compile time with a Python exception; invalid *instances* never raise —
they produce violation rows (SURVEY.md §1.3.5).
"""

from __future__ import annotations


class SchemaError(Exception):
    """Base class for schema-compilation failures."""


class MalformedSchemaError(SchemaError):
    """A schema document is structurally invalid.

    Mirrors SchemaError::Malformed { path, keyword, detail }
    (/root/reference/src/types/schema_error.rs:10-11).
    """

    def __init__(self, path: str, keyword: str, detail: str):
        self.path = path
        self.keyword = keyword
        self.detail = detail
        super().__init__(f"malformed schema at {path or '#'} keyword {keyword!r}: {detail}")


class RefResolutionError(SchemaError):
    """A $ref could not be resolved (loader failure / unknown target).

    Mirrors SchemaError::LoaderError — a fetch failure at compile is an
    error (/root/reference/src/keywords/ref_.rs:43).
    """


class CyclicRefError(SchemaError):
    """A $ref cycle was detected at compile time.

    The reference memoizes only completed compiles so a self-referential
    $ref recurses forever (/root/reference/src/types/scope_builder.rs:47-52);
    we detect the cycle with an in-progress set instead (SURVEY.md §1.4).
    """


class UninitialisedPlanError(SchemaError):
    """A check plan was executed before build() finalized it.

    Mirrors the uninitialised-schema sentinel error
    (/root/reference/src/types/schema.rs:71-73).
    """


class UnsupportedVocabularyError(SchemaError):
    """A 2019-09/2020-12 ``$vocabulary`` declaration REQUIRES (value
    ``true``) a vocabulary this engine does not implement.

    Core §8.1.2: an implementation that encounters a meta-schema
    requiring an unrecognized vocabulary "MUST refuse to process" it —
    refusing at compile beats the silent-ignore the installed jsonschema
    library exhibits (it falls back to its latest built-in dialect when
    the meta-schema is unknown). Optional vocabularies (value ``false``)
    are ignorable by definition and never raise.
    """

    def __init__(self, path: str, uri: str):
        self.path = path
        self.uri = uri
        super().__init__(
            f"schema at {path or '#'} requires unsupported vocabulary {uri!r}"
            " ($vocabulary value true); supported vocabularies are the"
            " standard 2019-09/2020-12 sets"
        )
