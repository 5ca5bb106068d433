"""Value accessors: a uniform view over "a JSON value in a Spark column".

The reference validates one JSON tree at a time through the JsonType trait
(/root/reference/src/types/schema.rs:8, src/keywords/type_.rs:52-68 use
``get_attribute`` / ``as_object`` / ``as_array`` / ``as_string``). Our
set-oriented analog is an *accessor*: a thin compile-time wrapper around a
``pyspark.sql.Column`` that answers the same questions — what primitive type
is this value, give me its string/number/array/object view — as Column
expressions over the whole column at once.

Two concrete accessors:

- ``TypedAccessor``  — the column's Spark type is known from the DataFrame
  schema, so type questions fold to compile-time constants (a ``type:
  string`` check on a StringType column costs nothing at runtime).
- ``VariantAccessor`` — the column holds arbitrary JSON parsed to Spark 4
  VariantType (``F.parse_json``); type questions become per-row JVM
  expressions via ``schema_of_variant`` — still zero per-row Python.

Primitive type tags follow the reference's PrimitiveType enum
(/root/reference/src/keywords/type_.rs:8): null, boolean, integer, number,
string, array, object — with the corpus semantics ``number ⊇ integer`` and
"a float with zero fractional part is an integer" (SURVEY.md §1.4: the
reference's exact-match at src/keywords/type_.rs:104 diverges; corpus wins).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

TAGS = ("null", "boolean", "integer", "number", "string", "array", "object")





class JsonAccessor(ABC):
    """One JSON value, viewed as Column expressions."""

    #: the underlying Column
    col: Column

    @abstractmethod
    def is_missing(self) -> Column:
        """True where the value is *absent* (SQL NULL), as opposed to JSON
        null. Absent values are vacuously valid for every keyword except
        presence checks (SURVEY.md §1.3.3)."""

    @abstractmethod
    def has_type(self, tags: frozenset[str] | set[str]) -> Column:
        """Membership of this value's primitive type in ``tags``.

        Must honor number ⊇ integer: an integer instance satisfies
        ``{"type": "number"}``."""

    @abstractmethod
    def as_string(self) -> Column:
        """String value (only meaningful where has_type({'string'}))."""

    @abstractmethod
    def as_double(self) -> Column:
        """Numeric value as double (only where numeric)."""

    @abstractmethod
    def as_boolean(self) -> Column:
        """Boolean value (only where boolean)."""

    @abstractmethod
    def as_array(self) -> Column:
        """Array view: ArrayType column (elements re-wrappable via element)."""

    @abstractmethod
    def as_object(self) -> Column:
        """Object view: MapType(string -> value) column."""

    @abstractmethod
    def element(self, elem: Column) -> "JsonAccessor":
        """Wrap an element of as_array() / a value of as_object()."""

    @abstractmethod
    def get_field(self, name: str) -> "JsonAccessor":
        """Accessor for object property ``name`` (missing => is_missing)."""

    @abstractmethod
    def has_field(self, name: str) -> Column:
        """True where the object has property ``name`` (present-ness, not
        non-null-ness of the value: a property explicitly set to JSON null
        is *present*)."""

    @abstractmethod
    def canonical(self) -> Column:
        """Canonical JSON text for equality comparison: object keys sorted,
        numbers normalized (1.0 == 1). Used by enum/const/uniqueItems."""

    # ---- static type info, for compile-time folding -------------------
    def static_tag(self) -> str | None:
        """Primitive tag if known at compile time, else None."""
        return None


# ---------------------------------------------------------------------------
# Variant accessor (arbitrary JSON)
# ---------------------------------------------------------------------------

def _vtag(col: Column) -> Column:
    """Per-row primitive-type tag of a variant column.

    schema_of_variant returns e.g. VOID / BOOLEAN / BIGINT / DECIMAL(2,1)
    / DOUBLE / STRING / ARRAY<...> / OBJECT<...> (verified on pyspark
    4.1.2). Integral doubles/decimals tag as 'integer' per corpus
    semantics (draft4 type.json: "a float with zero fractional part is an
    integer")."""
    s = F.schema_of_variant(col)
    dbl = F.try_variant_get(col, "$", "double")
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(s == "VOID", F.lit("null"))
        .when(s == "BOOLEAN", F.lit("boolean"))
        .when(s == "BIGINT", F.lit("integer"))
        .when(s.startswith("ARRAY"), F.lit("array"))
        .when(s.startswith("OBJECT"), F.lit("object"))
        .when(s == "STRING", F.lit("string"))
        # remaining: DECIMAL(p,s) / DOUBLE / FLOAT — numeric
        .when(dbl.isNotNull() & (dbl == F.floor(dbl)), F.lit("integer"))
        .otherwise(F.lit("number"))
    )


class VariantAccessor(JsonAccessor):
    """Arbitrary JSON value held in a VariantType column.

    Derived Columns (type tag, typed casts, the object map, per-field
    sub-accessors) are CACHED per accessor instance: Column objects are
    immutable JVM handles, so a cached subtree is shared by reference
    across every keyword expression built over this accessor, while
    rebuilding it costs one py4j round-trip per expression node. On
    deeply nested schemas (each child accessor's column embeds its whole
    parent chain) the uncached construction cost is exponential in
    nesting depth — measured 79s -> <1s tree construction for one
    5-level unevaluatedProperties corpus schema."""

    def __init__(self, col: Column):
        self.col = col
        self._cache: dict = {}

    def _cached(self, key, build) -> Column:
        got = self._cache.get(key)
        if got is None:
            got = build()
            self._cache[key] = got
        return got

    def is_missing(self) -> Column:
        return self._cached("missing", lambda: self.col.isNull())

    def tag(self) -> Column:
        return self._cached("tag", lambda: _vtag(self.col))

    def has_type(self, tags) -> Column:
        tags = set(tags)
        if "number" in tags:
            tags.add("integer")  # number ⊇ integer
        key = ("has_type", tuple(sorted(tags)))
        return self._cached(key, lambda: self.tag().isin(sorted(tags)))

    def as_string(self) -> Column:
        return self._cached(
            "string",
            lambda: F.when(
                F.schema_of_variant(self.col) == "STRING",
                F.try_variant_get(self.col, "$", "string"),
            ),
        )

    def as_double(self) -> Column:
        # gate on numeric tag so booleans/"1" don't coerce
        def build():
            s = F.schema_of_variant(self.col)
            numeric = (
                (s == "BIGINT") | (s == "DOUBLE") | (s == "FLOAT") | s.startswith("DECIMAL")
            )
            return F.when(numeric, F.try_variant_get(self.col, "$", "double"))

        return self._cached("double", build)

    def as_boolean(self) -> Column:
        return self._cached(
            "boolean",
            lambda: F.when(
                F.schema_of_variant(self.col) == "BOOLEAN",
                F.try_variant_get(self.col, "$", "boolean"),
            ),
        )

    def as_array(self) -> Column:
        return self._cached(
            "array",
            lambda: F.when(
                F.schema_of_variant(self.col).startswith("ARRAY"),
                F.try_variant_get(self.col, "$", "array<variant>"),
            ),
        )

    def as_object(self) -> Column:
        return self._cached(
            "object",
            lambda: F.when(
                F.schema_of_variant(self.col).startswith("OBJECT"),
                F.try_variant_get(self.col, "$", "map<string,variant>"),
            ),
        )

    def element(self, elem: Column) -> "VariantAccessor":
        return VariantAccessor(elem)

    def get_field(self, name: str) -> "VariantAccessor":
        got = self._cache.get(("field", name))
        if got is None:
            got = VariantAccessor(F.try_element_at(self.as_object(), F.lit(name)))
            self._cache[("field", name)] = got
        return got

    def has_field(self, name: str) -> Column:
        return self._cached(
            ("has_field", name),
            lambda: F.coalesce(
                F.map_contains_key(self.as_object(), F.lit(name)), F.lit(False)
            ),
        )

    def canonical(self) -> Column:
        # to_json on variant sorts object keys and normalizes numbers
        # (verified: {"b":2,"a":1} -> {"a":1,"b":2}; 1.00 -> 1)
        return self._cached("canonical", lambda: F.to_json(self.col))


class RowAccessor(JsonAccessor):
    """A whole DataFrame row viewed as a JSON object whose properties are
    the columns. This is how a table-level schema (`required`,
    `properties`, `dependencies` over columns) compiles against typed
    data: SQL NULL means the property is ABSENT (SURVEY.md §1.3.3), so
    `required: [c]` becomes c IS NOT NULL and every other keyword is
    null-vacuous — matching the reference's absent-property skip
    (/root/reference/src/keywords/properties_.rs:124-128)."""

    def __init__(self, schema: "T.StructType"):
        self.schema = schema
        self.col = None  # the row itself; no single underlying column

    def static_tag(self) -> str:
        return "object"

    def is_missing(self) -> Column:
        return F.lit(False)  # a row always exists

    def has_type(self, tags) -> Column:
        return F.lit("object" in set(tags))

    def get_field(self, name: str) -> JsonAccessor:
        if name in self.schema.fieldNames():
            return TypedAccessor(F.col(name), self.schema[name].dataType)
        return TypedAccessor(F.lit(None), T.NullType())

    def has_field(self, name: str) -> Column:
        if name not in self.schema.fieldNames():
            return F.lit(False)
        return F.col(name).isNotNull()

    def _unsupported(self, what: str):
        raise TypeError(
            f"{what} is not supported on a row-level schema; apply it to a "
            f"specific column instead"
        )

    def as_string(self) -> Column:
        self._unsupported("string view of a row")

    def as_double(self) -> Column:
        self._unsupported("numeric view of a row")

    def as_boolean(self) -> Column:
        self._unsupported("boolean view of a row")

    def as_array(self) -> Column:
        self._unsupported("array view of a row")

    def as_object(self) -> Column:
        self._unsupported("map view of a row (patternProperties/minProperties)")

    def element(self, elem: Column) -> JsonAccessor:
        self._unsupported("element access on a row")

    def canonical(self) -> Column:
        self._unsupported("canonical form of a row")


def json_accessor(col: Column) -> "VariantAccessor":
    """Accessor over a JSON-text column, malformed-input-safe.

    Uses try_parse_json: malformed JSON becomes NULL (vacuously valid)
    instead of aborting the job under ANSI FAILFAST — one bad record in
    10^12 rows must produce a violation row, never a job kill. Pair with
    ``malformed_json_check`` to surface the bad records."""
    return VariantAccessor(F.try_parse_json(col))


def malformed_json_check(col: Column) -> Column:
    """Pass predicate that fails exactly on non-NULL, non-parseable JSON
    text. The compile-vs-validate split of the reference (SchemaError vs
    ValidationError, SURVEY.md §1.3.5) applied to *data*: bad data is a
    violation row."""
    return col.isNull() | F.try_parse_json(col).isNotNull()


# ---------------------------------------------------------------------------
# Typed accessor (schema-known DataFrame columns)
# ---------------------------------------------------------------------------

def _static_tag_of(dtype: T.DataType) -> str:
    if isinstance(dtype, T.NullType):
        return "null"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    if isinstance(dtype, T.DecimalType):
        return "integer" if dtype.scale == 0 else "number"
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return "number"
    if isinstance(dtype, (T.StringType, T.VarcharType, T.CharType)):
        return "string"
    if isinstance(dtype, T.ArrayType):
        return "array"
    if isinstance(dtype, (T.StructType, T.MapType)):
        return "object"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        # timestamps validate as strings (ISO-8601 'format: date-time');
        # bounds compare natively in compile_minimum/maximum
        return "string"
    if isinstance(dtype, T.BinaryType):
        return "string"
    raise TypeError(f"unsupported column type for validation: {dtype}")


class TypedAccessor(JsonAccessor):
    """A value whose Spark type is known from the DataFrame schema.

    Type-membership questions fold to Python booleans at compile time, so
    Catalyst never sees a per-row type check — this is the "schema-enforced
    column types make most `type` checks free" row of SURVEY.md §2.1.
    """

    def __init__(self, col: Column, dtype: T.DataType):
        self.col = col
        self.dtype = dtype
        self._tag = _static_tag_of(dtype)

    def static_tag(self) -> str:
        return self._tag

    def is_missing(self) -> Column:
        return self.col.isNull()

    def has_type(self, tags) -> Column:
        tags = set(tags)
        if "number" in tags:
            tags.add("integer")
        # numeric columns can hold non-integral values even when the spec
        # says integer — only fold when unambiguous
        if self._tag == "number" and "integer" in tags and "number" not in tags:
            d = self.col.cast("double")
            return d == F.floor(d)
        return F.lit(True) if self._tag in tags else F.lit(False)

    def as_string(self) -> Column:
        if isinstance(self.dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            return F.date_format(self.col, "yyyy-MM-dd'T'HH:mm:ssXXX")
        if isinstance(self.dtype, T.BinaryType):
            return self.col.cast("string")
        return self.col if self._tag == "string" else F.lit(None).cast("string")

    def as_double(self) -> Column:
        if self._tag in ("integer", "number"):
            return self.col.cast("double")
        if self._tag == "boolean":
            return F.lit(None).cast("double")
        return F.lit(None).cast("double")

    def as_boolean(self) -> Column:
        return self.col if self._tag == "boolean" else F.lit(None).cast("boolean")

    def as_array(self) -> Column:
        return self.col if self._tag == "array" else F.lit(None)

    def as_object(self) -> Column:
        if isinstance(self.dtype, T.MapType):
            return self.col
        return F.lit(None)

    def element(self, elem: Column) -> JsonAccessor:
        if isinstance(self.dtype, T.ArrayType):
            return TypedAccessor(elem, self.dtype.elementType)
        if isinstance(self.dtype, T.MapType):
            return TypedAccessor(elem, self.dtype.valueType)
        raise TypeError(f"element() on non-collection type {self.dtype}")

    def get_field(self, name: str) -> JsonAccessor:
        if isinstance(self.dtype, T.StructType):
            if name in self.dtype.fieldNames():
                return TypedAccessor(self.col.getField(name), self.dtype[name].dataType)
            # statically absent field: a NULL of NullType => always missing
            return TypedAccessor(F.lit(None), T.NullType())
        if isinstance(self.dtype, T.MapType):
            return TypedAccessor(
                F.try_element_at(self.col, F.lit(name)), self.dtype.valueType
            )
        raise TypeError(f"get_field() on non-object type {self.dtype}")

    def has_field(self, name: str) -> Column:
        if isinstance(self.dtype, T.StructType):
            if name not in self.dtype.fieldNames():
                return F.lit(False)
            # struct fields are always "present"; NULL value == present null
            return self.col.isNotNull()
        if isinstance(self.dtype, T.MapType):
            return F.coalesce(F.map_contains_key(self.col, F.lit(name)), F.lit(False))
        return F.lit(False)

    def canonical(self) -> Column:
        if self._tag in ("array", "object"):
            return F.to_json(self.col)
        if self._tag == "string":
            return F.to_json(F.struct(self.col.alias("v"))).substr(F.lit(6), F.length(F.to_json(F.struct(self.col.alias("v")))) - F.lit(6))
        if self._tag == "integer":
            return self.col.cast("long").cast("string")
        if self._tag == "number":
            d = self.col.cast("double")
            # try_cast: huge integral doubles overflow long under ANSI
            return F.when(
                (d == F.floor(d)) & d.try_cast("long").isNotNull(),
                d.try_cast("long").cast("string"),
            ).otherwise(d.cast("string"))
        if self._tag == "boolean":
            return F.when(self.col, F.lit("true")).otherwise(F.lit("false"))
        return F.lit("null")
