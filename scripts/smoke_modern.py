"""Ad-hoc library-parity smoke for the modern-dialect (2019-09/2020-12)
keyword compilers: compiles each schema with the Spark engine and
compares verdicts against jsonschema's Draft201909/Draft202012
validators over a pile of instances. Dev harness only — the durable
checks live in tests/ + the stamped corpus."""

import json
import sys

from jsonschema import Draft201909Validator, Draft202012Validator

from jsonschema_validator_spark.functions.accessors import VariantAccessor
from jsonschema_validator_spark.functions.keywords import Scope, compile_schema, pred_of
from jsonschema_validator_spark.session import get_spark

CASES = [
    # (draft, schema, instances)
    ("draft2020-12", {"prefixItems": [{"type": "integer"}, {"type": "string"}]},
     [[1, "a"], ["a", 1], [1], [], [1, "a", 99], "nope", {"a": 1}]),
    ("draft2020-12", {"prefixItems": [{"type": "integer"}], "items": {"type": "string"}},
     [[1], [1, "a", "b"], [1, "a", 2], ["x"], []]),
    ("draft2020-12", {"prefixItems": [{"type": "integer"}], "items": False},
     [[1], [1, 2], [], ["a"]]),
    ("draft2020-12", {"items": {"minimum": 3}}, [[3, 4], [2], [], "str"]),
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
    ("draft2020-12", {"dependentSchemas": {"a": {"required": ["b"], "properties": {"b": {"type": "integer"}}}}},
     [{"a": 1, "b": 2}, {"a": 1, "b": "x"}, {"a": 1}, {"c": 0}, []]),
    ("draft2020-12", {"dependencies": {"a": ["b"]}},  # ignored unknown keyword in modern
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
    # $ref WITH siblings (modern conjunction)
    ("draft2020-12",
     {"$defs": {"num": {"type": "number"}}, "$ref": "#/$defs/num", "minimum": 10},
     [12, 5, "s", 10]),
    ("draft2019-09",
     {"definitions": {"num": {"type": "number"}}, "$ref": "#/definitions/num", "maximum": 3},
     [2, 5, 3]),
    # if/then/else in modern
    ("draft2020-12",
     {"if": {"type": "integer"}, "then": {"minimum": 5}, "else": {"type": "string"}},
     [7, 3, "ok", [1]]),
    # $recursiveRef (2019-09): classic extensible-tree
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
    # $recursiveRef where extension overrides base (strict-tree)
    ("draft2019-09",
     {"$id": "http://ex.com/strict-tree",
      "$recursiveAnchor": True,
      "$ref": "tree",
      "unknownKeyword_not_used": 1,
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
    # $dynamicRef (2020-12): list-of-T specialization
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
    # $dynamicRef without outer anchor falls back to in-resource default
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
    ("draft2020-12",
     {"patternProperties": {"^x": True}, "unevaluatedProperties": False},
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
    ("draft2020-12",
     {"properties": {"a": True}, "additionalProperties": {"type": "integer"},
      "unevaluatedProperties": False},
     [{"a": "s", "b": 1}, {"a": "s", "b": "t"}, {}]),
    # 2019-09 legacy quirks: object-valued additionalProperties
    # contributes its dict KEYS, not value-validating keys
    ("draft2019-09",
     {"properties": {"a": True}, "additionalProperties": {"type": "integer"},
      "unevaluatedProperties": False},
     [{"a": "s", "b": 1}, {"a": "s", "b": "t"}, {"type": 1}, {}]),
    ("draft2019-09", {"properties": {"a": True}, "unevaluatedProperties": False},
     [{"a": 1}, {"a": 1, "b": 2}, {}]),
    ("draft2019-09",
     {"allOf": [{"properties": {"a": True}}], "unevaluatedProperties": {"type": "string"}},
     [{"a": 1, "b": "ok"}, {"a": 1, "b": 2}, {}]),
    # unevaluatedItems
    ("draft2020-12", {"prefixItems": [{"type": "integer"}], "unevaluatedItems": False},
     [[1], [1, 2], [], ["a"]]),
    ("draft2020-12", {"prefixItems": [True], "unevaluatedItems": {"type": "string"}},
     [[1, "a"], [1, 2], [1], []]),
    ("draft2020-12",
     {"allOf": [{"prefixItems": [True, True]}], "unevaluatedItems": False},
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
    # if/then item evaluation
    ("draft2020-12",
     {"if": {"prefixItems": [{"const": 1}]}, "then": {"prefixItems": [True, True]},
      "unevaluatedItems": False},
     [[1, 2], [1, 2, 3], [2], [2, 3]]),
]

CASES = CASES + UNEVALUATED

VALIDATOR = {"draft2019-09": Draft201909Validator, "draft2020-12": Draft202012Validator}


def main():
    spark = get_spark()
    from pyspark.sql import functions as F

    rows, preds, expected = [], [], {}
    for gi, (draft, schema, instances) in enumerate(CASES):
        scope = Scope(draft=draft)
        scope.root = schema
        fused = pred_of(compile_schema(schema, scope))
        preds.append(fused)
        v = VALIDATOR[draft](schema)
        for ci, inst in enumerate(instances):
            rows.append((gi, ci, json.dumps(inst)))
            expected[(gi, ci)] = v.is_valid(inst)

    df = spark.createDataFrame(rows, "gi int, ci int, doc string")
    cols = [
        F.when(F.col("gi") == gi, F.coalesce(p(VariantAccessor(F.try_parse_json(F.col("doc")))), F.lit(True)))
        for gi, p in enumerate(preds)
    ]
    out = df.select("gi", "ci", F.coalesce(*cols).alias("got")).collect()
    bad = 0
    for r in out:
        exp = expected[(r.gi, r.ci)]
        if bool(r.got) != exp:
            bad += 1
            print(f"MISMATCH group={r.gi} case={r.ci} draft={CASES[r.gi][0]} got={r.got} want={exp} "
                  f"schema={json.dumps(CASES[r.gi][1])[:120]} data={rows[[i for i,(g,c,_) in enumerate(rows) if g==r.gi and c==r.ci][0]][2]}")
    print(f"{len(out) - bad}/{len(out)} agree with jsonschema library")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
