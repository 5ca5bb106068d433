"""Generate library-oracled corpus files (VERDICT r2 item #1).

Hand-written (schema, instance) pairs — modeled on the official
JSON-Schema-Test-Suite's $id/$ref/scoping coverage, which is pinned by
the reference (/root/reference/.gitmodules:1-3) but not checked out in
this container — with EXPECTED VALUES stamped by the installed
``jsonschema`` library (4.26, the canonical Python implementation).
The builder writes only the inputs; the verdicts come from an
independent implementation, so a shared spec-misreading between the
engine and the corpus author cannot pass silently.

Outputs tests/corpus/draft7_library.json and draft4_library.json in
JSON-Schema-Test-Suite format; tests/test_keywords_corpus.py runs them
through the Spark compiler, and tests/test_library_parity.py re-checks
the stamped verdicts against the library on every run.

Draft4 pairs avoid zero-fraction floats under integer typing (the one
documented engine deviation — see DEVIATIONS in
tests/test_keywords_corpus.py).

Usage: python scripts/gen_corpus_library.py
"""

from __future__ import annotations

import json
from pathlib import Path

from jsonschema import Draft4Validator, Draft7Validator

OUT = Path(__file__).resolve().parent.parent / "tests" / "corpus"

# each entry: (description, schema, [instance, ...])
DRAFT7 = [
    (
        "root $id with location-independent anchor",
        {
            "$id": "http://example.com/root.json",
            "definitions": {"A": {"$id": "#foo", "type": "integer"}},
            "allOf": [{"$ref": "#foo"}],
        },
        [1, -3, "1", 1.5, None, [1], {"a": 1}, True],
    ),
    (
        "anchor referenced from a sibling branch",
        {
            "$id": "http://example.com/root.json",
            "definitions": {"A": {"$id": "#num", "minimum": 10}},
            "properties": {"q": {"$ref": "#num"}},
        },
        [{"q": 11}, {"q": 9}, {"q": "str"}, {}, {"q": 10}],
    ),
    (
        "nested $id changes base for inner relative $ref",
        {
            "$id": "http://example.com/root.json",
            "definitions": {
                "B": {
                    "$id": "other.json",
                    "definitions": {
                        "X": {"$id": "t/inner.json", "type": "string"}
                    },
                }
            },
            "allOf": [{"$ref": "http://example.com/t/inner.json"}],
        },
        ["s", "", 1, None, ["s"], {"s": 1}],
    ),
    (
        "relative $ref resolved against nested $id base",
        {
            "$id": "http://example.com/a/root.json",
            "definitions": {
                "B": {
                    "$id": "http://example.com/b/doc.json",
                    "definitions": {"X": {"maxLength": 2}},
                    "properties": {"inner": {"$ref": "#/definitions/X"}},
                }
            },
            "allOf": [{"$ref": "http://example.com/b/doc.json"}],
        },
        [{"inner": "ab"}, {"inner": "abc"}, {"inner": 5}, {}, "zz"],
    ),
    (
        "pointer walk crossing a nested $id rebases the target's refs",
        {
            "$id": "http://example.com/root.json",
            "definitions": {
                "sub": {
                    "$id": "sub.json",
                    "definitions": {
                        "y": {"properties": {"v": {"$ref": "#/definitions/z"}}},
                        "z": {"type": "boolean"},
                    },
                }
            },
            "allOf": [{"$ref": "http://example.com/sub.json#/definitions/y"}],
        },
        [{"v": True}, {"v": False}, {"v": 1}, {"v": "true"}, {}, 7],
    ),
    (
        "$id inside an enum value is data, not an identifier",
        {
            "$id": "http://example.com/root.json",
            "definitions": {
                "real": {"$id": "#real", "type": "integer"},
            },
            "properties": {
                "e": {"enum": [{"$id": "#fake", "type": "string"}, 1]},
                "r": {"$ref": "#real"},
            },
        },
        [
            {"e": 1, "r": 2},
            {"e": {"$id": "#fake", "type": "string"}, "r": 2},
            {"e": "x", "r": 2},
            {"e": 1, "r": "no"},
        ],
    ),
    (
        "ref chain through three definitions",
        {
            "definitions": {
                "a": {"$ref": "#/definitions/b"},
                "b": {"$ref": "#/definitions/c"},
                "c": {"type": "array", "minItems": 2},
            },
            "$ref": "#/definitions/a",
        },
        [[1, 2], [1], [], "ab", {"x": 1}, [None, None, None]],
    ),
    (
        "escaped JSON-pointer tokens (~0 ~1 percent)",
        {
            "definitions": {
                "a/b": {"minimum": 1},
                "a~b": {"maximum": 5},
                "per%cent": {"multipleOf": 2},
            },
            "allOf": [
                {"$ref": "#/definitions/a~1b"},
                {"$ref": "#/definitions/a~0b"},
                {"$ref": "#/definitions/per%25cent"},
            ],
        },
        [2, 4, 6, 1, 3, 0, -2, "x"],
    ),
    (
        "boolean subschemas in properties and items",
        {
            "properties": {"never": False, "always": True},
            "items": {"properties": {"no": False}},
        },
        [
            {"always": 1},
            {"never": 1},
            [{"no": 1}],
            [{"ok": 1}, {"ok": 2}],
            {},
            [],
        ],
    ),
    (
        "recursive tree schema (bounded data depth)",
        {
            "definitions": {
                "node": {
                    "type": "object",
                    "required": ["v"],
                    "properties": {
                        "v": {"type": "integer"},
                        "kids": {
                            "type": "array",
                            "items": {"$ref": "#/definitions/node"},
                        },
                    },
                }
            },
            "$ref": "#/definitions/node",
        },
        [
            {"v": 1},
            {"v": 1, "kids": [{"v": 2}, {"v": 3, "kids": [{"v": 4}]}]},
            {"v": 1, "kids": [{"v": "bad"}]},
            {"v": 1, "kids": [{"kids": []}]},
            {"kids": []},
            {"v": 1, "kids": [{"v": 2, "kids": [{"v": 3, "kids": [{"v": 4}]}]}]},
        ],
    ),
    (
        "oneOf of anyOf with not",
        {
            "oneOf": [
                {"anyOf": [{"type": "integer"}, {"minLength": 3}]},
                {"not": {"type": "string"}},
            ]
        },
        [5, "abcd", "ab", None, [1], 2.5, "xy"],
    ),
    (
        "if/then/else with $ref arms",
        {
            "definitions": {
                "big": {"minimum": 100},
                "neg": {"maximum": 0},
            },
            "if": {"type": "integer"},
            "then": {"$ref": "#/definitions/big"},
            "else": {"$ref": "#/definitions/neg"},
        },
        [150, 50, -1.5, 3.5, "s", None],
    ),
    (
        "additionalProperties interplay with properties and patternProperties",
        {
            "properties": {"a": {"type": "integer"}},
            "patternProperties": {"^p": {"type": "string"}},
            "additionalProperties": {"type": "boolean"},
        },
        [
            {"a": 1, "p1": "s", "other": True},
            {"a": "no"},
            {"p9": 4},
            {"other": 1},
            {"a": 2, "pz": "ok", "flag": False, "bad": "x"},
            {},
        ],
    ),
    (
        "propertyNames with dependencies",
        {
            "propertyNames": {"maxLength": 3},
            "dependencies": {"ab": ["cd"], "xy": {"minProperties": 3}},
        },
        [
            {"ab": 1, "cd": 2},
            {"ab": 1},
            {"xy": 1, "cd": 2, "ef": 3},
            {"xy": 1, "cd": 2},
            {"long": 1},
            {},
        ],
    ),
    (
        "contains with uniqueItems over mixed types",
        {
            "type": "array",
            "uniqueItems": True,
            "contains": {"type": "object", "required": ["k"]},
        },
        [
            [{"k": 1}, 2],
            [{"k": 1}, {"k": 1}],
            [1, 2, 3],
            [{"k": 1}, {"k": 2}, "x"],
            [],
            [[1], [1]],
        ],
    ),
    (
        "enum distinguishes bool from number and deep-compares containers",
        {"enum": [1, [True], {"a": [0, 1]}, "1"]},
        [1, True, [True], [1], {"a": [0, 1]}, {"a": [0, 1, 2]}, "1", 1.0],
    ),
    (
        "const object with nested array",
        {"const": {"x": [1, "two", None], "y": {"z": False}}},
        [
            {"x": [1, "two", None], "y": {"z": False}},
            {"y": {"z": False}, "x": [1, "two", None]},
            {"x": [1, "two", None], "y": {"z": 0}},
            {"x": [1, "two"], "y": {"z": False}},
            "other",
        ],
    ),
    (
        "$ref siblings are ignored in draft7",
        {
            "definitions": {"any": {}},
            "properties": {
                "p": {"$ref": "#/definitions/any", "type": "integer"}
            },
        },
        [{"p": "not an int but ref wins"}, {"p": 1}, {}],
    ),
    (
        "items array form with additionalItems schema",
        {
            "items": [{"type": "integer"}, {"type": "string"}],
            "additionalItems": {"type": "boolean"},
        },
        [
            [1, "a", True, False],
            [1, "a", 1],
            ["a", 1],
            [1],
            [],
            [1, "a"],
        ],
    ),
    (
        "exclusive bounds draft6 numeric form via $ref",
        {
            "definitions": {"rng": {"exclusiveMinimum": 0, "exclusiveMaximum": 10}},
            "items": {"$ref": "#/definitions/rng"},
        },
        [[1, 9.5], [0], [10], [0.001], ["s", None], []],
    ),
]

DRAFT7_EXTRA = [
    (
        "double negation",
        {"not": {"not": {"type": "integer"}}},
        [1, "1", None, 2.5, [1]],
    ),
    (
        "oneOf with boolean subschemas",
        {"oneOf": [True, {"type": "string"}]},
        ["s", 1, None, [1]],
    ),
    (
        "contains with minItems/maxItems interplay",
        {"contains": {"type": "string"}, "minItems": 2, "maxItems": 4},
        [["a", 1], [1, 2], ["a"], [1, 2, 3, "b"], [1, 2, 3, 4, "c"], "na"],
    ),
    (
        "additionalProperties false closes the object",
        {
            "properties": {"a": True},
            "patternProperties": {"^x": True},
            "additionalProperties": False,
        },
        [{"a": 1}, {"x1": 2}, {"a": 1, "x2": 3}, {"b": 1}, {}],
    ),
    (
        "items positional with contains over the whole array",
        {
            "items": [{"type": "integer"}, {"type": "integer"}],
            "additionalItems": {"type": "string"},
            "contains": {"const": 7},
        },
        [[7, 1, "a"], [1, 2, "a"], [1, 7], [7], [1, 2, 7]],
    ),
    (
        "allOf with conflicting bounds is unsatisfiable for numbers",
        {"allOf": [{"minimum": 10}, {"maximum": 5}]},
        [7, 10, 5, "string passes", None],
    ),
    (
        "if/then without else",
        {"if": {"type": "string"}, "then": {"minLength": 3}},
        ["abcd", "ab", 1, None],
    ),
    (
        "ref to a boolean schema",
        {"definitions": {"nope": False}, "properties": {"p": {"$ref": "#/definitions/nope"}}},
        [{"p": 1}, {}, {"q": 1}],
    ),
    (
        "deeply nested properties chain",
        {
            "properties": {
                "a": {
                    "properties": {
                        "b": {
                            "properties": {"c": {"type": "integer"}},
                            "required": ["c"],
                        }
                    }
                }
            }
        },
        [
            {"a": {"b": {"c": 1}}},
            {"a": {"b": {"c": "x"}}},
            {"a": {"b": {}}},
            {"a": {}},
            {},
            {"a": {"b": 5}},
        ],
    ),
    (
        "dependencies chain with schema form",
        {
            "dependencies": {
                "a": {"required": ["b"]},
                "b": {"properties": {"c": {"type": "integer"}}},
            }
        },
        [
            {"a": 1, "b": 2},
            {"a": 1},
            {"b": 1, "c": 2},
            {"b": 1, "c": "x"},
            {"c": "free"},
            {},
        ],
    ),
    (
        "uniqueItems across container types",
        {"uniqueItems": True},
        [
            [{"a": 1}, {"a": 1}],
            [{"a": 1}, {"a": 2}],
            [[1], [1]],
            [[1], [2]],
            [1, "1", True, None],
            [],
        ],
    ),
    (
        "enum of objects with property order differences",
        {"enum": [{"x": 1, "y": 2}]},
        [{"x": 1, "y": 2}, {"y": 2, "x": 1}, {"x": 1}, {"x": 1, "y": 2, "z": 3}],
    ),
]

DRAFT4_EXTRA = [
    (
        "draft4 ref chain through definitions",
        {
            "definitions": {
                "a": {"$ref": "#/definitions/b"},
                "b": {"minimum": 3},
            },
            "properties": {"n": {"$ref": "#/definitions/a"}},
        },
        [{"n": 5}, {"n": 2}, {"n": "s"}, {}],
    ),
    (
        "draft4 enum with heterogeneous values",
        {"enum": [[1, 2], {"k": "v"}, "str", 17, None]},
        [[1, 2], [2, 1], {"k": "v"}, {"k": "w"}, "str", 17, None, 18],
    ),
    (
        "draft4 not with allOf",
        {"not": {"allOf": [{"minimum": 0}, {"maximum": 10}]}},
        [5, -1, 11, "string fails not(allOf pass-through)", None],
    ),
    (
        "draft4 patternProperties with additionalProperties false",
        {
            "patternProperties": {"^a": {"type": "integer"}},
            "additionalProperties": False,
        },
        [{"a1": 1}, {"a1": "x"}, {"b": 1}, {}],
    ),
    (
        "draft4 multipleOf on floats avoiding dialect traps",
        {"multipleOf": 0.5},
        [1.5, 2, 1.25, 0.5, 3.75],
    ),
    (
        "draft4 maxProperties/minProperties",
        {"minProperties": 1, "maxProperties": 2},
        [{}, {"a": 1}, {"a": 1, "b": 2}, {"a": 1, "b": 2, "c": 3}, "scalar"],
    ),
]

DRAFT6 = [
    (
        "draft6 ignores if/then/else (unknown keywords)",
        {"if": {"type": "integer"}, "then": {"minimum": 100}, "else": {"maxLength": 1}},
        [1, 150, "long string", None, [1, 2]],
    ),
    (
        "draft6 const",
        {"const": [1, "a"]},
        [[1, "a"], [1, "a", 2], [1], "a", 1],
    ),
    (
        "draft6 contains",
        {"contains": {"minimum": 5}},
        [[1, 6], [1, 2], [], "no-array-passes", [5]],
    ),
    (
        "draft6 propertyNames",
        {"propertyNames": {"pattern": "^[ab]"}},
        [{"apple": 1, "bat": 2}, {"cat": 1}, {}, [1, 2], {"a": 1, "zz": 2}],
    ),
    (
        "draft6 numeric exclusiveMinimum/Maximum",
        {"exclusiveMinimum": 2, "exclusiveMaximum": 8},
        [3, 2, 8, 7.5, 2.001, "s"],
    ),
    (
        "draft6 boolean root schemas via items",
        {"items": False},
        [[], [1], "scalar"],
    ),
    (
        "draft6 $id anchor",
        {
            "$id": "http://example.com/d6root.json",
            "definitions": {"A": {"$id": "#neg", "maximum": 0}},
            "properties": {"n": {"$ref": "#neg"}},
        },
        [{"n": -1}, {"n": 1}, {"n": 0}, {}],
    ),
]

DRAFT4 = [
    (
        "draft4 id keyword with anchor",
        {
            "id": "http://example.com/d4root.json",
            "definitions": {"A": {"id": "#pos", "minimum": 0}},
            "properties": {"n": {"$ref": "#pos"}},
        },
        [{"n": 1}, {"n": -1}, {"n": "s"}, {}, {"n": 0}],
    ),
    (
        "draft4 nested id changes base",
        {
            "id": "http://example.com/d4root.json",
            "definitions": {
                "B": {
                    "id": "d4other.json",
                    "definitions": {"X": {"id": "t/d4inner.json", "type": "string"}},
                }
            },
            "allOf": [{"$ref": "http://example.com/t/d4inner.json"}],
        },
        ["ok", 3, None, ["ok"]],
    ),
    (
        "draft4 boolean exclusiveMinimum",
        {"minimum": 5, "exclusiveMinimum": True},
        [6, 5, 4, 5.5, "5"],
    ),
    (
        "draft4 dependencies array and schema forms",
        {
            "dependencies": {
                "credit": ["billing"],
                "name": {"required": ["first"]},
            }
        },
        [
            {"credit": 1, "billing": 2},
            {"credit": 1},
            {"name": "x", "first": "y"},
            {"name": "x"},
            {},
            "scalar-passes",
        ],
    ),
    (
        "draft4 items positional with additionalItems false",
        {"items": [{"type": "integer"}], "additionalItems": False},
        [[1], [1, 2], [], ["a"]],
    ),
    (
        "draft4 anyOf/oneOf/allOf nest with $ref",
        {
            "definitions": {"s": {"type": "string"}, "n": {"type": "number"}},
            "anyOf": [
                {"allOf": [{"$ref": "#/definitions/n"}, {"minimum": 3}]},
                {"oneOf": [{"$ref": "#/definitions/s"}, {"maxLength": 2}]},
            ],
        },
        [4, 2, "anything", [1, 2], None, 2.5],
    ),
]


def _registry_for(schema, spec):
    """Crawl the schema document so embedded ``$id``/``id`` subresources
    and anchors resolve in-memory (no network in this container)."""
    from referencing import Registry, Resource

    from referencing.exceptions import NoInternalID

    res = Resource.from_contents(schema, default_specification=spec)
    try:
        return (res @ Registry()).crawl()
    except NoInternalID:
        # no root identifier -> internal pointer refs only; nothing to crawl
        return Registry()


def build(pairs, validator_cls, spec):
    groups = []
    for desc, schema, instances in pairs:
        v = validator_cls(schema, registry=_registry_for(schema, spec))
        tests = []
        for inst in instances:
            ok = v.is_valid(inst)
            tests.append(
                {
                    "description": f"{json.dumps(inst)[:60]} -> {ok}",
                    "data": inst,
                    "valid": ok,
                }
            )
        groups.append({"description": desc, "schema": schema, "tests": tests})
    return groups


def modern_pairs(draft: str):
    """Curated modern-dialect cases (the same inputs
    tests/test_modern_drafts.py checks live) plus an independently-seeded
    random batch — verdicts stamped by the library at generation time."""
    import random
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tests.test_modern_drafts import CURATED, UNEVALUATED, _gen_schema, _gen_value

    pairs = [
        (f"curated: {json.dumps(schema)[:70]}", schema, instances)
        for d, schema, instances in CURATED + UNEVALUATED
        if d == draft
    ]
    # different seeds than the runtime test so the corpus adds coverage
    r = random.Random(77_2020 if draft == "draft2020-12" else 77_2019)
    for i in range(25):
        schema = _gen_schema(r, draft)
        pairs.append((f"generated #{i}", schema, [_gen_value(r) for _ in range(8)]))
    return pairs


def main():
    from referencing.jsonschema import (
        DRAFT4 as SPEC4,
        DRAFT6 as SPEC6,
        DRAFT7 as SPEC7,
        DRAFT201909 as SPEC19,
        DRAFT202012 as SPEC20,
    )
    from jsonschema import Draft6Validator, Draft201909Validator, Draft202012Validator

    d7 = build(DRAFT7 + DRAFT7_EXTRA, Draft7Validator, SPEC7)
    d6 = build(DRAFT6, Draft6Validator, SPEC6)
    d4 = build(DRAFT4 + DRAFT4_EXTRA, Draft4Validator, SPEC4)
    d19 = build(modern_pairs("draft2019-09"), Draft201909Validator, SPEC19)
    d20 = build(modern_pairs("draft2020-12"), Draft202012Validator, SPEC20)
    for name, groups in (("draft2019_library.json", d19), ("draft2020_library.json", d20)):
        (OUT / name).write_text(json.dumps(groups, indent=1))
        n = sum(len(g["tests"]) for g in groups)
        print(f"{name}: {len(groups)} groups, {n} cases")
    (OUT / "draft6_library.json").write_text(json.dumps(d6, indent=1))
    n6 = sum(len(g["tests"]) for g in d6)
    print(f"draft6_library.json: {len(d6)} groups, {n6} cases")
    (OUT / "draft7_library.json").write_text(json.dumps(d7, indent=1))
    (OUT / "draft4_library.json").write_text(json.dumps(d4, indent=1))
    n7 = sum(len(g["tests"]) for g in d7)
    n4 = sum(len(g["tests"]) for g in d4)
    print(f"draft7_library.json: {len(d7)} groups, {n7} cases")
    print(f"draft4_library.json: {len(d4)} groups, {n4} cases")


if __name__ == "__main__":
    main()
