"""Property-based parity (SURVEY.md §5): the keyword->Column compiler
must agree with an INDEPENDENT pure-Python draft evaluator on randomly
generated (schema, value) pairs.

Two layers:
- compile totality (hypothesis, no Spark): arbitrary JSON-ish dicts
  either compile or raise MalformedSchemaError — never any other
  exception (the compile-time/runtime error split, SURVEY §1.3.5).
- verdict parity (seeded random corpus, batched Spark jobs): ~25 random
  schemas x 12 random values each; one Spark action per schema keeps
  the suite fast. The generator deliberately avoids cross-dialect traps
  (regex dialects, 1 vs 1.0 equality, 5.0-as-integer) — those contracts
  are pinned by the corpus tests instead.
"""

from __future__ import annotations

import json
import math
import random
import re

import pytest
from hypothesis import given, settings, strategies as st

from jsonschema_validator_spark.errors import MalformedSchemaError
from jsonschema_validator_spark.functions.keywords import compile_schema, pred_of

# ---------------------------------------------------------------------------
# hypothesis: compile totality
# ---------------------------------------------------------------------------

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-100, 100),
    st.text(max_size=8),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)
json_values = st.recursive(
    json_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(max_size=6), inner, max_size=4),
    ),
    max_leaves=10,
)
schema_like = st.dictionaries(
    st.sampled_from(
        [
            "type", "enum", "const", "required", "pattern", "minimum",
            "maximum", "exclusiveMinimum", "exclusiveMaximum", "multipleOf",
            "minLength", "maxLength", "minItems", "maxItems", "uniqueItems",
            "items", "contains", "properties", "allOf", "anyOf", "oneOf",
            "not", "if", "then", "else", "junkKeyword",
        ]
    ),
    json_values,
    max_size=5,
)


@settings(max_examples=150, deadline=None)
@given(schema_like)
def test_compile_totality(schema):
    try:
        checks = compile_schema(schema)
    except MalformedSchemaError:
        return
    assert isinstance(checks, list)


# ---------------------------------------------------------------------------
# seeded random (schema, value) parity vs a pure-Python evaluator
# ---------------------------------------------------------------------------

WORDS = ["abc", "zz", "hello world", "", "a1", "xyz xyz", "Bq"]


def gen_value(r: random.Random, depth: int = 0):
    kinds = ["null", "int", "str"]
    if depth < 2:
        kinds += ["arr", "obj", "float"]
    k = r.choice(kinds)
    if k == "null":
        return None
    if k == "int":
        return r.randint(-20, 20)
    if k == "float":
        return r.randint(-200, 200) / 8 + 0.125  # never integral
    if k == "str":
        return r.choice(WORDS)
    if k == "arr":
        return [gen_value(r, depth + 1) for _ in range(r.randint(0, 4))]
    return {w: gen_value(r, depth + 1) for w in r.sample(["p", "q", "r"], r.randint(0, 3))}


def gen_schema(r: random.Random, depth: int = 0) -> dict:
    focus = r.choice(["number", "string", "array", "object", "combo"])
    s: dict = {}
    if focus == "number":
        if r.random() < 0.5:
            s["type"] = r.choice(["integer", "number", ["integer", "string"]])
        if r.random() < 0.7:
            s["minimum"] = r.randint(-10, 10)
        if r.random() < 0.5:
            s["maximum"] = r.randint(-5, 15)
        if r.random() < 0.3:
            s["exclusiveMinimum"] = r.randint(-10, 10)
        if r.random() < 0.3:
            s["multipleOf"] = r.choice([2, 3, 5])
    elif focus == "string":
        if r.random() < 0.5:
            s["type"] = "string"
        if r.random() < 0.6:
            s["minLength"] = r.randint(0, 4)
        if r.random() < 0.6:
            s["maxLength"] = r.randint(2, 8)
        if r.random() < 0.4:
            s["pattern"] = r.choice(["^a", "z+", "^[a-z ]+$", "1$"])
        if r.random() < 0.3:
            s["enum"] = r.sample(WORDS, 3) + [r.randint(-5, 5)]
    elif focus == "array":
        if r.random() < 0.5:
            s["type"] = "array"
        if r.random() < 0.6:
            s["minItems"] = r.randint(0, 3)
        if r.random() < 0.5:
            s["maxItems"] = r.randint(1, 5)
        if r.random() < 0.4:
            s["uniqueItems"] = True
        if depth < 1 and r.random() < 0.5:
            s["items"] = gen_schema(r, depth + 1)
        if depth < 1 and r.random() < 0.3:
            s["contains"] = {"type": "integer"}
    elif focus == "object":
        if r.random() < 0.5:
            s["type"] = "object"
        if r.random() < 0.6:
            s["required"] = r.sample(["p", "q", "r"], r.randint(1, 2))
        if depth < 1 and r.random() < 0.6:
            s["properties"] = {
                w: gen_schema(r, depth + 1) for w in r.sample(["p", "q"], r.randint(1, 2))
            }
        if r.random() < 0.3:
            s["minProperties"] = r.randint(0, 2)
        if r.random() < 0.3:
            s["maxProperties"] = r.randint(1, 3)
        if depth < 1 and r.random() < 0.3:
            s["patternProperties"] = {"^p": gen_schema(r, depth + 1)}
        if r.random() < 0.3:
            s["propertyNames"] = {"pattern": r.choice(["^[pq]", "^[a-z]$"])}
        if depth < 1 and r.random() < 0.3:
            s["dependencies"] = {"p": r.choice([["q"], gen_schema(r, depth + 1)])}
    else:
        subs = [gen_schema(r, depth + 1) for _ in range(r.randint(1, 3))]
        s[r.choice(["allOf", "anyOf", "oneOf"])] = subs
        if r.random() < 0.3:
            s["not"] = gen_schema(r, depth + 1)
    return s or {"type": "string"}


# -- independent evaluator (draft7 subset, same vacuous-truth contract) ----

def _tag(v):
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


def py_valid(schema: dict, v) -> bool:
    t = _tag(v)

    def num(x):
        return isinstance(x, (int, float)) and not isinstance(x, bool)

    if "type" in schema:
        want = schema["type"]
        want = [want] if isinstance(want, str) else want
        ok = t in want or (t == "integer" and "number" in want)
        if not ok:
            return False
    if "enum" in schema:
        if not any(type(e) is type(v) and e == v for e in schema["enum"]):
            return False
    if "const" in schema:
        c = schema["const"]
        if not (type(c) is type(v) and c == v):
            return False
    if num(v):
        if "minimum" in schema and v < schema["minimum"]:
            return False
        if "maximum" in schema and v > schema["maximum"]:
            return False
        if "exclusiveMinimum" in schema and v <= schema["exclusiveMinimum"]:
            return False
        if "exclusiveMaximum" in schema and v >= schema["exclusiveMaximum"]:
            return False
        if "multipleOf" in schema:
            k = schema["multipleOf"]
            if isinstance(v, int):
                if v % k != 0:
                    return False
            elif abs(v / k - round(v / k)) > 1e-9:
                return False
    if t == "string":
        if "minLength" in schema and len(v) < schema["minLength"]:
            return False
        if "maxLength" in schema and len(v) > schema["maxLength"]:
            return False
        if "pattern" in schema and not re.search(schema["pattern"], v):
            return False
    if t == "array":
        if "minItems" in schema and len(v) < schema["minItems"]:
            return False
        if "maxItems" in schema and len(v) > schema["maxItems"]:
            return False
        if schema.get("uniqueItems"):
            seen = [json.dumps(x, sort_keys=True) for x in v]
            if len(set(seen)) != len(seen):
                return False
        if "items" in schema and isinstance(schema["items"], dict):
            if not all(py_valid(schema["items"], x) for x in v):
                return False
        if "contains" in schema:
            if not any(py_valid(schema["contains"], x) for x in v):
                return False
    if t == "object":
        for rq in schema.get("required", []):
            if rq not in v:
                return False
        for name, sub in (schema.get("properties") or {}).items():
            if name in v and not py_valid(sub, v[name]):
                return False
        if "minProperties" in schema and len(v) < schema["minProperties"]:
            return False
        if "maxProperties" in schema and len(v) > schema["maxProperties"]:
            return False
        for pat, sub in (schema.get("patternProperties") or {}).items():
            for name, val in v.items():
                if re.search(pat, name) and not py_valid(sub, val):
                    return False
        if "propertyNames" in schema:
            for name in v:
                if not py_valid(schema["propertyNames"], name):
                    return False
        for dep_key, dep in (schema.get("dependencies") or {}).items():
            if dep_key in v:
                if isinstance(dep, list):
                    if not all(x in v for x in dep):
                        return False
                elif not py_valid(dep, v):
                    return False
    for sub in schema.get("allOf", []):
        if not py_valid(sub, v):
            return False
    if "anyOf" in schema and not any(py_valid(s, v) for s in schema["anyOf"]):
        return False
    if "oneOf" in schema and sum(py_valid(s, v) for s in schema["oneOf"]) != 1:
        return False
    if "not" in schema and py_valid(schema["not"], v):
        return False
    return True


@pytest.mark.parametrize("seed", range(5))
def test_random_schema_value_parity(spark, seed):
    from pyspark.sql import functions as F

    from jsonschema_validator_spark.functions.accessors import VariantAccessor

    r = random.Random(1000 + seed)
    failures = []
    for si in range(5):
        schema = gen_schema(r)
        values = [gen_value(r) for _ in range(12)]
        pred = pred_of(compile_schema(schema))
        df = spark.createDataFrame([(json.dumps(v),) for v in values], "j string")
        got = [
            bool(row.ok)
            for row in df.select(
                F.coalesce(
                    pred(VariantAccessor(F.try_parse_json("j"))), F.lit(True)
                ).alias("ok")
            ).collect()
        ]
        want = [py_valid(schema, v) for v in values]
        for v, g, w in zip(values, got, want):
            if g != w:
                failures.append((schema, v, f"spark={g} python={w}"))
    assert not failures, failures[:5]


@pytest.mark.parametrize("seed", range(3))
def test_schema_api_batch_parity(spark, seed):
    """Same random (schema, value) parity, routed through the document
    API's batch path (Schema.validate_many) — pins the bound-accessor
    projections (api._bind) to the semantics of the plain variant path
    on arbitrarily nested schemas."""
    from jsonschema_validator_spark.api import Schema

    r = random.Random(7000 + seed)
    failures = []
    for si in range(4):
        schema = gen_schema(r)
        values = [gen_value(r) for _ in range(10)]
        s = Schema(schema, spark, draft="draft7")
        df = spark.createDataFrame([(json.dumps(v),) for v in values], "j string")
        got = [bool(row.valid) for row in s.validate_many(df).collect()]
        want = [py_valid(schema, v) for v in values]
        for v, g, w in zip(values, got, want):
            if g != w:
                failures.append((schema, v, f"api={g} python={w}"))
    assert not failures, failures[:5]


# ---------------------------------------------------------------------------
# hypothesis: winnowing guarantee + NFC canonicalization law (no Spark —
# the pure-Python replica below is pinned equal to the Spark operator by
# tests/test_pipeline_ops.py::test_winnow_fingerprints_reference, so the
# properties proven here transfer to the Column implementation)
# ---------------------------------------------------------------------------

K, W = 5, 4


def _winnow_ref(tokens):
    import hashlib

    grams = [
        " ".join(tokens[i : i + K]) for i in range(max(len(tokens) - K + 1, 1))
    ]
    hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    if len(hs) < W:
        return {min(hs)}
    return {min(hs[i : i + W]) for i in range(len(hs) - W + 1)}


words = st.text(alphabet="abcdefgh", min_size=1, max_size=4)


@settings(max_examples=200, deadline=None)
@given(
    shared=st.lists(words, min_size=K + W - 1, max_size=20),
    pre_a=st.lists(words, max_size=10),
    post_a=st.lists(words, max_size=10),
    pre_b=st.lists(words, max_size=10),
    post_b=st.lists(words, max_size=10),
)
def test_winnow_shared_run_guarantee(shared, pre_a, post_a, pre_b, post_b):
    """The winnowing theorem (Schleimer/Wilkerson/Aiken §3): ANY two
    documents sharing a contiguous token run of length >= w + k - 1
    share at least one fingerprint, wherever the run sits in either
    document. This is the property that makes the excerpt screen
    complete (no false negatives above the threshold length)."""
    a = pre_a + shared + post_a
    b = pre_b + shared + post_b
    assert _winnow_ref(a) & _winnow_ref(b), (a, b)


@settings(max_examples=200, deadline=None)
@given(doc=st.lists(words, min_size=1, max_size=40))
def test_winnow_density_bound(doc):
    """Fingerprint count never exceeds the window count (one min per
    window before dedup), and is at least 1 for any non-empty text —
    the size bound that makes the downstream self-join shuffle
    predictable."""
    fps = _winnow_ref(doc)
    n_grams = max(len(doc) - K + 1, 1)
    n_windows = max(n_grams - W + 1, 1)
    assert 1 <= len(fps) <= n_windows


@settings(max_examples=300, deadline=None)
@given(s=st.text(max_size=60))
def test_nfc_idempotent_and_canonical(s):
    """NFC normalization law the dedup stack relies on: idempotent, and
    NFD(s) (the maximally-decomposed form) normalizes to the same
    canonical string as s — so any two canonically-equivalent spellings
    of the same content get the same exact-dedup key after
    normalize_unicode."""
    import unicodedata

    nfc = unicodedata.normalize("NFC", s)
    assert unicodedata.normalize("NFC", nfc) == nfc
    assert unicodedata.normalize("NFC", unicodedata.normalize("NFD", s)) == nfc


# ---------------------------------------------------------------------------
# hypothesis: packing-discipline invariants (no Spark — pure replicas of
# the per-shard scan in operators/packing.pack_sequences, which
# tests/test_pipeline_ops.py::test_packing_strategies pins against the
# Spark operator on both engineered mixes)
# ---------------------------------------------------------------------------


def _nextfit_bins(sizes, budget):
    out, cur, run = [], 0, 0
    for t in sizes:
        if run > 0 and run + t > budget:
            cur += 1
            run = 0
        run += t
        out.append(cur)
    return out


def _ffd_bins(sizes_desc, budget):
    space, out = [], []
    for t in sizes_desc:
        for i, room in enumerate(space):
            if t <= room:
                space[i] = room - t
                out.append(i)
                break
        else:
            space.append(max(budget - t, 0))
            out.append(len(space) - 1)
    return out


@settings(max_examples=300, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 700), min_size=1, max_size=60),
    budget=st.integers(100, 600),
)
def test_ffd_invariants(sizes, budget):
    """For ANY size mix: first-fit never uses more bins than next-fit
    on the SAME (descending) order — the provable domination; FFD vs
    ARRIVAL-order next-fit is deliberately NOT asserted (an arrival
    order that happens to equal an optimal consecutive packing makes
    next-fit hit OPT while FFD can sit at 11/9 OPT). Every FFD bin
    respects the budget unless it holds a single oversize item; the doc
    multiset is preserved; at least one bin per oversize item."""
    desc = sorted(sizes, reverse=True)
    sd = _nextfit_bins(desc, budget)
    ffd = _ffd_bins(desc, budget)
    n_sd, n_ffd = len(set(sd)), len(set(ffd))
    assert n_ffd <= n_sd
    # bin contents respect the budget except single-oversize bins
    by_bin = {}
    for t, b in zip(desc, ffd):
        by_bin.setdefault(b, []).append(t)
    for items in by_bin.values():
        assert sum(items) <= budget or (len(items) == 1 and items[0] > budget)
    assert sorted(t for items in by_bin.values() for t in items) == sorted(sizes)
    assert n_ffd >= sum(1 for t in sizes if t > budget) or not any(
        t > budget for t in sizes
    )
