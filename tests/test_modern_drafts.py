"""draft2019-09 / draft2020-12 dialect parity vs the jsonschema library.

The library (the canonical Python implementation, also the stamping
oracle for tests/corpus/*_library.json) is consulted AT RUNTIME here, so
these expected values are author-independent by construction.

Layers:
- curated cases: every modern keyword (prefixItems, 2020 items,
  min/maxContains, dependent*, $defs/$anchor, $ref-with-siblings,
  $recursiveRef, $dynamicRef, unevaluatedProperties/Items incl. the
  library's legacy-vs-modern finder quirks) — one Spark action total.
- seeded random sweep: generated modern schemas x random values,
  library-stamped per pair — one Spark action per draft.
"""

from __future__ import annotations

import json
import random

import pytest
from jsonschema import Draft201909Validator, Draft202012Validator
from pyspark.sql import functions as F

from jsonschema_validator_spark.functions.accessors import VariantAccessor
from jsonschema_validator_spark.functions.keywords import (
    Scope,
    compile_schema,
    pred_of,
)

VALIDATOR = {"draft2019-09": Draft201909Validator, "draft2020-12": Draft202012Validator}


def _run_groups(spark, groups):
    """groups: [(draft, schema, [instance,...])]. Runs every case in ONE
    Spark action; asserts Spark verdict == library verdict per case."""
    rows, preds, expected, labels = [], [], {}, {}
    for gi, (draft, schema, instances) in enumerate(groups):
        scope = Scope(draft=draft)
        scope.root = schema
        preds.append(pred_of(compile_schema(schema, scope)))
        v = VALIDATOR[draft](schema)
        for ci, inst in enumerate(instances):
            rows.append((gi, ci, json.dumps(inst)))
            expected[(gi, ci)] = v.is_valid(inst)
            labels[(gi, ci)] = (draft, schema, inst)

    df = spark.createDataFrame(rows, "gi int, ci int, doc string")
    cols = [
        F.when(
            F.col("gi") == gi,
            F.coalesce(p(VariantAccessor(F.try_parse_json(F.col("doc")))), F.lit(True)),
        )
        for gi, p in enumerate(preds)
    ]
    got = df.select("gi", "ci", F.coalesce(*cols).alias("ok")).collect()
    mismatches = [
        f"{labels[(r.gi, r.ci)][0]}: schema={json.dumps(labels[(r.gi, r.ci)][1])[:150]} "
        f"data={json.dumps(labels[(r.gi, r.ci)][2])[:80]} got={bool(r.ok)} want={expected[(r.gi, r.ci)]}"
        for r in got
        if bool(r.ok) != expected[(r.gi, r.ci)]
    ]
    assert not mismatches, "\n".join(mismatches[:20])


CURATED = [
    ("draft2020-12", {"prefixItems": [{"type": "integer"}, {"type": "string"}]},
     [[1, "a"], ["a", 1], [1], [], [1, "a", 99], "nope", {"a": 1}]),
    ("draft2020-12", {"prefixItems": [{"type": "integer"}], "items": {"type": "string"}},
     [[1], [1, "a", "b"], [1, "a", 2], ["x"], []]),
    ("draft2020-12", {"prefixItems": [{"type": "integer"}], "items": False},
     [[1], [1, 2], [], ["a"]]),
    ("draft2019-09", {"items": [{"type": "integer"}], "additionalItems": {"type": "string"}},
     [[1, "a"], [1, 2], ["a"], []]),
    ("draft2019-09", {"contains": {"minimum": 5}, "minContains": 2, "maxContains": 3},
     [[5, 6], [5], [5, 6, 7, 8], [], [1, 9, 9], [9, 9, 9, 1]]),
    ("draft2020-12", {"contains": {"type": "string"}, "minContains": 0},
     [[], [1], ["a"], [1, 2]]),
    ("draft2020-12", {"contains": {"type": "string"}, "minContains": 0, "maxContains": 1},
     [[], ["a"], ["a", "b"], [1]]),
    ("draft2019-09", {"dependentRequired": {"a": ["b", "c"]}},
     [{"a": 1, "b": 2, "c": 3}, {"a": 1, "b": 2}, {"b": 2}, {}, 5]),
    ("draft2020-12",
     {"dependentSchemas": {"a": {"required": ["b"], "properties": {"b": {"type": "integer"}}}}},
     [{"a": 1, "b": 2}, {"a": 1, "b": "x"}, {"a": 1}, {"c": 0}, []]),
    ("draft2020-12", {"dependencies": {"a": ["b"]}},  # unknown keyword in modern: ignored
     [{"a": 1}, {"a": 1, "b": 2}]),
    ("draft2020-12",
     {"$defs": {"pos": {"type": "integer", "minimum": 1}},
      "properties": {"n": {"$ref": "#/$defs/pos"}}},
     [{"n": 3}, {"n": 0}, {"n": "x"}, {}]),
    ("draft2020-12",
     {"$id": "http://ex.com/root.json",
      "$defs": {"A": {"$anchor": "posint", "type": "integer", "minimum": 1}},
      "$ref": "#posint"},
     [3, 0, "x", 1.5]),
    ("draft2020-12",
     {"$defs": {"num": {"type": "number"}}, "$ref": "#/$defs/num", "minimum": 10},
     [12, 5, "s", 10]),
    ("draft2019-09",
     {"definitions": {"num": {"type": "number"}}, "$ref": "#/definitions/num", "maximum": 3},
     [2, 5, 3]),
    ("draft2020-12",
     {"if": {"type": "integer"}, "then": {"minimum": 5}, "else": {"type": "string"}},
     [7, 3, "ok", [1]]),
    ("draft2019-09",
     {"$id": "http://ex.com/tree",
      "$recursiveAnchor": True,
      "type": "object",
      "properties": {
          "data": True,
          "children": {"type": "array", "items": {"$recursiveRef": "#"}},
      }},
     [{"data": 1, "children": [{"data": 2, "children": []}]},
      {"children": [{"children": "bad"}]},
      {"children": ["bad"]},
      {}]),
    # $recursiveRef: extension overrides base through the dynamic scope
    ("draft2019-09",
     {"$id": "http://ex.com/strict-tree",
      "$recursiveAnchor": True,
      "$ref": "tree",
      "$defs": {
          "tree": {
              "$id": "http://ex.com/tree",
              "$recursiveAnchor": True,
              "type": "object",
              "properties": {
                  "data": True,
                  "children": {"type": "array", "items": {"$recursiveRef": "#"}},
              },
          }
      },
      "properties": {"data": True, "children": True},
      "additionalProperties": False},
     [{"data": 1, "children": [{"data": 2}]},
      {"data": 1, "children": [{"data": 2, "extra": 3}]},
      {"extra": 1}]),
    # $dynamicRef: list-of-T specialization (the spec's motivating example)
    ("draft2020-12",
     {"$id": "http://ex.com/strict-list",
      "$ref": "list",
      "$defs": {
          "intItems": {"$dynamicAnchor": "T", "type": "integer"},
          "list": {
              "$id": "http://ex.com/list",
              "type": "array",
              "items": {"$dynamicRef": "#T"},
              "$defs": {"default": {"$dynamicAnchor": "T", "$comment": "any"}},
          },
      }},
     [[1, 2], [1, "a"], [], ["a"]]),
    ("draft2020-12",
     {"$id": "http://ex.com/list2",
      "type": "array",
      "items": {"$dynamicRef": "#T"},
      "$defs": {"default": {"$dynamicAnchor": "T", "type": "string"}}},
     [["a"], [1], []]),
]

UNEVALUATED = [
    ("draft2020-12", {"properties": {"a": True}, "unevaluatedProperties": False},
     [{"a": 1}, {"a": 1, "b": 2}, {}, {"b": 2}, 7]),
    ("draft2020-12", {"properties": {"a": True}, "unevaluatedProperties": {"type": "integer"}},
     [{"a": "x", "b": 2}, {"a": "x", "b": "y"}, {"b": 3}, {}]),
    ("draft2020-12", {"patternProperties": {"^x": True}, "unevaluatedProperties": False},
     [{"x1": 1}, {"x1": 1, "y": 2}, {}]),
    ("draft2020-12",
     {"allOf": [{"properties": {"a": True}}, {"properties": {"b": True}}],
      "unevaluatedProperties": False},
     [{"a": 1, "b": 2}, {"a": 1, "c": 3}, {}]),
    ("draft2020-12",
     {"anyOf": [{"required": ["a"], "properties": {"a": True}},
                {"required": ["b"], "properties": {"b": True}}],
      "unevaluatedProperties": False},
     [{"a": 1}, {"b": 1}, {"a": 1, "b": 2}, {"a": 1, "c": 2}, {"c": 1}]),
    ("draft2020-12",
     {"oneOf": [{"required": ["a"], "properties": {"a": True}},
                {"required": ["b"], "properties": {"b": True}}],
      "unevaluatedProperties": False},
     [{"a": 1}, {"a": 1, "b": 2}, {"a": 1, "c": 2}]),
    ("draft2020-12",
     {"if": {"required": ["a"]}, "then": {"properties": {"a": True, "b": True}},
      "else": {"properties": {"c": True}},
      "unevaluatedProperties": False},
     [{"a": 1, "b": 2}, {"a": 1, "c": 2}, {"c": 3}, {"b": 1}, {}]),
    ("draft2020-12",
     {"$defs": {"base": {"properties": {"a": True}}},
      "$ref": "#/$defs/base", "properties": {"b": True},
      "unevaluatedProperties": False},
     [{"a": 1, "b": 2}, {"a": 1, "c": 2}, {}]),
    ("draft2020-12",
     {"dependentSchemas": {"a": {"properties": {"extra": True}}},
      "properties": {"a": True},
      "unevaluatedProperties": False},
     [{"a": 1, "extra": 2}, {"extra": 2}, {"a": 1}, {}]),
    # modern finder: additionalProperties evaluates keys whose VALUE matches
    ("draft2020-12",
     {"properties": {"a": True}, "additionalProperties": {"type": "integer"},
      "unevaluatedProperties": False},
     [{"a": "s", "b": 1}, {"a": "s", "b": "t"}, {}]),
    # legacy finder quirk: object-valued additionalProperties contributes
    # its dict KEYS ("type"), not value-validating keys
    ("draft2019-09",
     {"properties": {"a": True}, "additionalProperties": {"type": "integer"},
      "unevaluatedProperties": False},
     [{"a": "s", "b": 1}, {"a": "s", "b": "t"}, {"type": 1}, {}]),
    ("draft2019-09", {"properties": {"a": True}, "unevaluatedProperties": False},
     [{"a": 1}, {"a": 1, "b": 2}, {}]),
    ("draft2019-09",
     {"allOf": [{"properties": {"a": True}}], "unevaluatedProperties": {"type": "string"}},
     [{"a": 1, "b": "ok"}, {"a": 1, "b": 2}, {}]),
    ("draft2020-12", {"prefixItems": [{"type": "integer"}], "unevaluatedItems": False},
     [[1], [1, 2], [], ["a"]]),
    ("draft2020-12", {"prefixItems": [True], "unevaluatedItems": {"type": "string"}},
     [[1, "a"], [1, 2], [1], []]),
    ("draft2020-12", {"allOf": [{"prefixItems": [True, True]}], "unevaluatedItems": False},
     [[1, 2], [1, 2, 3], [1], []]),
    ("draft2020-12", {"items": {"type": "integer"}, "unevaluatedItems": False},
     [[1, 2], [], ["a"]]),
    ("draft2020-12", {"contains": {"type": "string"}, "unevaluatedItems": False},
     [["a"], ["a", 1], [], ["a", "b"]]),
    ("draft2019-09", {"items": [{"type": "integer"}], "unevaluatedItems": False},
     [[1], [1, 2], [], ["a"]]),
    ("draft2019-09",
     {"items": [True], "additionalItems": {"type": "integer"}, "unevaluatedItems": False},
     [["a", 1], ["a", "b"], []]),
    ("draft2019-09", {"items": {"type": "integer"}, "unevaluatedItems": False},
     [[1, 2], ["a"], []]),
    ("draft2020-12",
     {"oneOf": [{"prefixItems": [{"const": 1}, True]}, {"prefixItems": [{"const": 2}]}],
      "unevaluatedItems": False},
     [[1, "x"], [2], [2, "x"], [3]]),
    ("draft2020-12",
     {"if": {"prefixItems": [{"const": 1}]}, "then": {"prefixItems": [True, True]},
      "unevaluatedItems": False},
     [[1, 2], [1, 2, 3], [2], [2, 3]]),
]


def test_modern_curated(spark):
    _run_groups(spark, CURATED + UNEVALUATED)


# ---------------------------------------------------------------------------
# seeded random sweep
# ---------------------------------------------------------------------------

_NAMES = ["a", "b", "c", "x1", "x2", "y"]


def _gen_value(r: random.Random, depth=0):
    kind = r.randrange(8 if depth < 2 else 5)
    if kind == 0:
        return r.randint(-5, 10)
    if kind == 1:
        return r.choice(["", "a", "hello", "x"])
    if kind == 2:
        return r.choice([True, False, None])
    if kind == 3:
        return round(r.uniform(-3, 12), 2)
    if kind == 4:
        return r.randint(0, 3)
    if kind == 5:
        return [_gen_value(r, depth + 1) for _ in range(r.randrange(4))]
    return {
        r.choice(_NAMES): _gen_value(r, depth + 1) for _ in range(r.randrange(4))
    }


def _gen_subschema(r: random.Random, draft: str, depth: int) -> dict | bool:
    # two composite levels max: a composite-in-composite schema
    # multiplies the compiled Column tree (~30 py4j calls per accessor x
    # accessors per node x nesting) — depth-3 random schemas measured
    # 10-80s of pure tree CONSTRUCTION each. Every modern keyword
    # interaction stays reachable (applicator + object subschema), and
    # the deeper interactions are pinned by the curated cases above.
    if depth > 0 or r.random() < 0.15:
        return r.choice(
            [True, {"type": "integer"}, {"type": "string"}, {"minimum": 3},
             {"type": "number", "maximum": 8}, {"enum": [1, "a", None]}]
        )
    return _gen_schema(r, draft, depth + 1)


def _gen_schema(r: random.Random, draft: str, depth: int = 0) -> dict:
    s: dict = {}
    # the $defs+$ref shape uses a root-relative pointer, so it is only
    # valid at the document root
    shape = r.randrange(4 if depth == 0 else 3)
    if shape == 0:  # object-ish
        s["properties"] = {
            n: _gen_subschema(r, draft, depth) for n in r.sample(_NAMES, r.randint(1, 3))
        }
        if r.random() < 0.4:
            s["patternProperties"] = {"^x": _gen_subschema(r, draft, depth)}
        if r.random() < 0.4:
            s["additionalProperties"] = r.choice([True, False, {"type": "integer"}])
        if r.random() < 0.35:
            s["required"] = r.sample(_NAMES, r.randint(1, 2))
        if r.random() < 0.3:
            s["dependentRequired"] = {r.choice(_NAMES): r.sample(_NAMES, 1)}
        if r.random() < 0.3:
            s["dependentSchemas"] = {r.choice(_NAMES): _gen_subschema(r, draft, depth)}
        if r.random() < 0.45:
            s["unevaluatedProperties"] = r.choice([False, {"type": "integer"}, {"type": "string"}])
    elif shape == 1:  # array-ish
        if draft == "draft2020-12":
            if r.random() < 0.6:
                s["prefixItems"] = [_gen_subschema(r, draft, depth) for _ in range(r.randint(1, 2))]
            if r.random() < 0.6:
                s["items"] = r.choice([False, _gen_subschema(r, draft, depth)])
        else:
            if r.random() < 0.5:
                s["items"] = [_gen_subschema(r, draft, depth) for _ in range(r.randint(1, 2))]
                if r.random() < 0.6:
                    s["additionalItems"] = r.choice([False, {"type": "integer"}])
            else:
                # boolean-valued single-schema `items` crashes the
                # LIBRARY's 2019-09 unevaluatedItems finder (len() on a
                # bool) — keep the oracle on defined ground
                sub = _gen_subschema(r, draft, depth)
                s["items"] = sub if isinstance(sub, dict) else {"type": "integer"}
        if r.random() < 0.4:
            s["contains"] = _gen_subschema(r, draft, depth)
            if r.random() < 0.6:
                s["minContains"] = r.randint(0, 2)
            if r.random() < 0.4:
                s["maxContains"] = r.randint(1, 3)
        if r.random() < 0.4:
            s["unevaluatedItems"] = r.choice([False, {"type": "integer"}])
        if r.random() < 0.3:
            s["uniqueItems"] = True
    elif shape == 2:  # combinators
        kw = r.choice(["allOf", "anyOf", "oneOf"])
        s[kw] = [_gen_subschema(r, draft, depth) for _ in range(r.randint(1, 2))]
        if r.random() < 0.4:
            s["if"] = _gen_subschema(r, draft, depth)
            if r.random() < 0.7:
                s["then"] = _gen_subschema(r, draft, depth)
            if r.random() < 0.5:
                s["else"] = _gen_subschema(r, draft, depth)
        if r.random() < 0.3:
            s["unevaluatedProperties"] = False
    else:  # $defs + $ref (+ siblings)
        s["$defs"] = {"d0": _gen_subschema(r, draft, depth)}
        s["$ref"] = "#/$defs/d0"
        if r.random() < 0.5:
            s[r.choice(["minimum", "maximum"])] = r.randint(0, 6)
        if r.random() < 0.3:
            s["type"] = r.choice(["integer", "number", "object", "array", "string"])
    return s


@pytest.mark.parametrize("draft", ["draft2019-09", "draft2020-12"])
def test_modern_random_parity(spark, draft):
    r = random.Random(20260817 if draft == "draft2020-12" else 20190917)
    groups = []
    for _ in range(40):
        schema = _gen_schema(r, draft)
        values = [_gen_value(r) for _ in range(8)]
        groups.append((draft, schema, values))
    _run_groups(spark, groups)


# --- $vocabulary compile handling (core §8.1.2; VERDICT r3 #6) -------------
# The installed jsonschema library SILENTLY falls back to its latest
# built-in dialect when a meta-schema is unknown (verified: building a
# validator whose $schema points at a registry-held meta-schema with an
# unknown required vocabulary emits only a DeprecationWarning and
# validates anyway). The spec says MUST refuse; this engine refuses at
# compile. These pins are therefore spec-consistent, strictly stricter
# than the library's fallback.

def _compile_modern(schema, draft):
    from jsonschema_validator_spark.functions.keywords import Scope, compile_schema

    scope = Scope(draft=draft)
    scope.root = schema
    return compile_schema(schema, scope)


@pytest.mark.parametrize("draft", ["draft2019-09", "draft2020-12"])
def test_vocabulary_standard_set_compiles(draft):
    from jsonschema_validator_spark.functions.keywords import SUPPORTED_VOCABULARIES

    schema = {
        "$vocabulary": {uri: True for uri in sorted(SUPPORTED_VOCABULARIES[draft])},
        "type": "string",
    }
    assert _compile_modern(schema, draft)  # compiles; type keyword present


@pytest.mark.parametrize("draft", ["draft2019-09", "draft2020-12"])
def test_vocabulary_unknown_required_refused(draft):
    from jsonschema_validator_spark.errors import UnsupportedVocabularyError

    schema = {"$vocabulary": {"https://example.com/vocab/custom": True}}
    with pytest.raises(UnsupportedVocabularyError, match="custom"):
        _compile_modern(schema, draft)


def test_vocabulary_unknown_optional_ignored():
    # value false = optional: ignorable by definition, never raises
    schema = {"$vocabulary": {"https://example.com/vocab/custom": False}, "type": "number"}
    assert _compile_modern(schema, "draft2020-12")


def test_vocabulary_cross_dialect_uri_is_unknown():
    from jsonschema_validator_spark.errors import UnsupportedVocabularyError

    # a 2019-09 vocab URI required by a 2020-12 meta-schema is unknown
    schema = {"$vocabulary": {"https://json-schema.org/draft/2019-09/vocab/core": True}}
    with pytest.raises(UnsupportedVocabularyError):
        _compile_modern(schema, "draft2020-12")


def test_vocabulary_malformed_declarations():
    from jsonschema_validator_spark.errors import MalformedSchemaError

    with pytest.raises(MalformedSchemaError, match="object"):
        _compile_modern({"$vocabulary": ["not", "a", "dict"]}, "draft2020-12")
    with pytest.raises(MalformedSchemaError, match="boolean"):
        _compile_modern(
            {"$vocabulary": {"https://json-schema.org/draft/2020-12/vocab/core": "yes"}},
            "draft2020-12",
        )


def test_vocabulary_inert_under_draft7():
    # draft<=7 has no $vocabulary keyword: stays annotation-inert
    from jsonschema_validator_spark.functions.keywords import Scope, compile_schema

    scope = Scope(draft="draft7")
    schema = {"$vocabulary": {"https://example.com/vocab/custom": True}, "type": "string"}
    scope.root = schema
    assert compile_schema(schema, scope)
