"""Generate systematic keyword-corpus matrices in JSON-Schema-Test-Suite
format (tests/corpus/draft4_matrix.json, draft7_matrix.json).

The official suite (pinned by the reference at
/root/reference/.gitmodules:1-3) exercises each keyword over a grid of
instance values; this generator reproduces that coverage style
programmatically: every (schema, instance) pair's expected verdict is
computed by an independent pure-Python evaluator written from the
draft4/draft7 spec text, NOT by the engine under test — so the corpus
stays a true oracle.

Engine-semantics notes (deliberate, documented deviations from the
official draft4 suite — see tests/test_keywords_corpus.py DEVIATIONS):
- `1.0` validates as "integer" in BOTH drafts (the variant/JSON-string
  ingestion path normalizes numeric lexemes; draft6+ semantics).

Run: python scripts/gen_corpus_matrix.py  (rewrites the two files)
"""

from __future__ import annotations

import json
import math
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "tests" / "corpus"

# ---------------------------------------------------------------------------
# independent evaluator (spec-derived, minimal keyword subset for matrices)
# ---------------------------------------------------------------------------


def json_type(v):
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


def type_matches(v, t):
    jt = json_type(v)
    if t == "number":
        return jt in ("number", "integer")
    if t == "integer":
        # engine semantics: floats with zero fractional part are integers
        return jt == "integer" or (jt == "number" and float(v).is_integer())
    return jt == t


def is_number(v):
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def check(schema, v) -> bool:
    """Evaluate the matrix keyword subset per spec (draft-agnostic here;
    the generator only emits draft-appropriate schemas)."""
    t = schema.get("type")
    if t is not None:
        types = t if isinstance(t, list) else [t]
        if not any(type_matches(v, x) for x in types):
            return False
    if "minimum" in schema and is_number(v):
        if schema.get("exclusiveMinimum") is True:
            if not v > schema["minimum"]:
                return False
        elif not v >= schema["minimum"]:
            return False
    elif isinstance(schema.get("exclusiveMinimum"), (int, float)) and not isinstance(
        schema.get("exclusiveMinimum"), bool
    ):
        if is_number(v) and not v > schema["exclusiveMinimum"]:
            return False
    if "maximum" in schema and is_number(v):
        if schema.get("exclusiveMaximum") is True:
            if not v < schema["maximum"]:
                return False
        elif not v <= schema["maximum"]:
            return False
    elif isinstance(schema.get("exclusiveMaximum"), (int, float)) and not isinstance(
        schema.get("exclusiveMaximum"), bool
    ):
        if is_number(v) and not v < schema["exclusiveMaximum"]:
            return False
    if "multipleOf" in schema and is_number(v):
        k = schema["multipleOf"]
        # decimal-lexeme divisibility (what both drafts intend)
        from decimal import Decimal

        try:
            if Decimal(str(float(v))) % Decimal(str(float(k))) != 0:
                return False
        except Exception:
            return False
    if "minLength" in schema and isinstance(v, str):
        if len(v) < schema["minLength"]:
            return False
    if "maxLength" in schema and isinstance(v, str):
        if len(v) > schema["maxLength"]:
            return False
    if "minItems" in schema and isinstance(v, list):
        if len(v) < schema["minItems"]:
            return False
    if "maxItems" in schema and isinstance(v, list):
        if len(v) > schema["maxItems"]:
            return False
    if schema.get("uniqueItems") is True and isinstance(v, list):
        canon = [json.dumps(canonical(x), sort_keys=True) for x in v]
        if len(set(canon)) != len(canon):
            return False
    if "required" in schema and isinstance(v, dict):
        if not all(k in v for k in schema["required"]):
            return False
    if "minProperties" in schema and isinstance(v, dict):
        if len(v) < schema["minProperties"]:
            return False
    if "maxProperties" in schema and isinstance(v, dict):
        if len(v) > schema["maxProperties"]:
            return False
    if "enum" in schema:
        cv = json.dumps(canonical(v), sort_keys=True)
        if cv not in {json.dumps(canonical(e), sort_keys=True) for e in schema["enum"]}:
            return False
    if "const" in schema:
        if json.dumps(canonical(v), sort_keys=True) != json.dumps(
            canonical(schema["const"]), sort_keys=True
        ):
            return False
    if "pattern" in schema and isinstance(v, str):
        import re

        if not re.search(schema["pattern"], v):
            return False
    return True


def canonical(v):
    """JSON-equality canonical form: ints and zero-fraction floats unify."""
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int, float)):
        f = float(v)
        return ("n", int(f)) if f.is_integer() else ("n", f)
    if isinstance(v, list):
        return ["a"] + [canonical(x) for x in v]
    if isinstance(v, dict):
        return {k: canonical(x) for k, x in v.items()}
    return v


# ---------------------------------------------------------------------------
# matrices
# ---------------------------------------------------------------------------

VALUES = [
    None,
    True,
    False,
    0,
    1,
    -1,
    3.5,
    1.0,
    -2.0,
    "",
    "foo",
    "1",
    [],
    [1, 2],
    ["a"],
    {},
    {"a": 1},
]

TYPE_SCHEMAS = (
    [{"type": t} for t in ["string", "number", "integer", "boolean", "object", "array", "null"]]
    + [
        {"type": ["string", "null"]},
        {"type": ["integer", "array"]},
        {"type": ["number", "boolean"]},
        {"type": ["object", "string"]},
        {"type": ["array", "null", "integer"]},
    ]
)

BOUND_SCHEMAS_D4 = [
    {"minimum": 1.1},
    {"maximum": 3.0},
    {"minimum": 1.1, "exclusiveMinimum": True},
    {"maximum": 3.0, "exclusiveMaximum": True},
    {"minimum": -2, "maximum": 2},
    {"minimum": 0, "exclusiveMinimum": False},
    {"maximum": 0, "exclusiveMaximum": False},
    {"minimum": 1, "maximum": 1},
]
BOUND_VALUES = [-3, -2, -2.0, 0, 0.0, 1, 1.0, 1.1, 1.2, 2, 2.5, 3, 3.0, 3.5, "2", None, [2], True]

BOUND_SCHEMAS_D7 = [
    {"exclusiveMinimum": 1.1},
    {"exclusiveMaximum": 3.0},
    {"minimum": 1.1},
    {"maximum": 3.0},
    {"exclusiveMinimum": 0, "exclusiveMaximum": 2},
]

MULTIPLE_SCHEMAS = [
    {"multipleOf": 2},
    {"multipleOf": 1.5},
    {"multipleOf": 0.0001},
    {"multipleOf": 0.01},
    {"type": "integer", "multipleOf": 3},
]
MULTIPLE_VALUES = [0, 2, 3, 4, 4.5, 6, 7, -6, -4.5, 0.0075, 0.0001, 0.00751, 0.05, 0.049, 9, 10, "2", None, 123456789.0001]

LENGTH_SCHEMAS = [
    {"minLength": 2},
    {"maxLength": 2},
    {"minLength": 2, "maxLength": 4},
    {"minLength": 0},
    {"maxLength": 0},
]
LENGTH_VALUES = ["", "a", "ab", "abc", "abcd", "abcde", "éé", "\U0001f4a9\U0001f4a9", 12, 2.0, None, ["a", "b"]]

ARRAY_SCHEMAS = [
    {"minItems": 1},
    {"maxItems": 2},
    {"minItems": 1, "maxItems": 3},
    {"uniqueItems": True},
    {"uniqueItems": False},
    {"minItems": 0, "uniqueItems": True},
]
ARRAY_VALUES = [
    [],
    [1],
    [1, 2],
    [1, 2, 3],
    [1, 2, 3, 4],
    [1, 1],
    [1, 1.0],
    [1, "1"],
    [0, False],
    [True, 1],
    [[1], [1]],
    [[1], [2]],
    [{"a": 1}, {"a": 1}],
    [{"a": 1}, {"a": 2}],
    [{"a": 1, "b": 2}, {"b": 2, "a": 1}],
    ["a", "b", "a"],
    [None, None],
    [{}, {}],
    "not an array",
    5,
]

OBJECT_SCHEMAS = [
    {"required": ["a"]},
    {"required": ["a", "b"]},
    {"minProperties": 1},
    {"maxProperties": 2},
    {"minProperties": 1, "maxProperties": 2},
]
# draft4's metaschema requires `required` be non-empty; draft6+ allows []
OBJECT_SCHEMAS_D7 = OBJECT_SCHEMAS + [{"required": []}]
OBJECT_VALUES = [
    {},
    {"a": 1},
    {"b": 1},
    {"a": None},
    {"a": 1, "b": 2},
    {"a": 1, "b": 2, "c": 3},
    {"c": 1, "d": 2},
    [],
    "ab",
    12,
    None,
]

ENUM_SCHEMAS = [
    {"enum": [1, 2, 3]},
    {"enum": ["a", "b"]},
    {"enum": [1.0, "1", True]},
    {"enum": [None]},
    {"enum": [[1, 2], {"k": "v"}]},
    {"enum": [0]},
    {"enum": [False]},
    {"enum": [{"a": 1, "b": 2}]},
]
ENUM_VALUES = [1, 1.0, 2, 3.5, "1", "a", True, False, 0, None, [1, 2], [2, 1], {"k": "v"}, {"a": 1, "b": 2}, {"b": 2, "a": 1}, {}, []]

PATTERN_SCHEMAS = [
    {"pattern": "^a"},
    {"pattern": "a+$"},
    {"pattern": "^[0-9]{3}$"},
    {"pattern": "b"},
]
PATTERN_VALUES = ["a", "ab", "ba", "aaa", "123", "1234", "b", "", 123, None, ["a"]]


def build_matrix(draft: str):
    groups = []

    def add(kind, schemas, values):
        for s in schemas:
            groups.append(
                {
                    "description": f"matrix {kind}: {json.dumps(s, sort_keys=True)}",
                    "schema": s,
                    "tests": [
                        {
                            "description": f"value {json.dumps(v)[:60]}",
                            "data": v,
                            "valid": check(s, v),
                        }
                        for v in values
                    ],
                }
            )

    add("type", TYPE_SCHEMAS, VALUES)
    if draft == "draft4":
        add("bounds", BOUND_SCHEMAS_D4, BOUND_VALUES)
    else:
        add("bounds", BOUND_SCHEMAS_D7, BOUND_VALUES)
        add("const", [{"const": v} for v in [1, "a", [1, 2], {"a": 1}, None, True, 1.0]], ENUM_VALUES)
    add("multipleOf", MULTIPLE_SCHEMAS, MULTIPLE_VALUES)
    add("length", LENGTH_SCHEMAS, LENGTH_VALUES)
    add("array", ARRAY_SCHEMAS, ARRAY_VALUES)
    add("object", OBJECT_SCHEMAS if draft == "draft4" else OBJECT_SCHEMAS_D7, OBJECT_VALUES)
    add("enum", ENUM_SCHEMAS, ENUM_VALUES)
    add("pattern", PATTERN_SCHEMAS, PATTERN_VALUES)
    return groups


def main():
    for draft, fname in [("draft4", "draft4_matrix.json"), ("draft7", "draft7_matrix.json")]:
        groups = build_matrix(draft)
        n = sum(len(g["tests"]) for g in groups)
        (OUT / fname).write_text(json.dumps(groups, indent=1))
        print(f"{fname}: {len(groups)} groups, {n} cases")


if __name__ == "__main__":
    main()
