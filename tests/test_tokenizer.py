"""Vocab-file-driven BPE tokenizer (operators/tokenizer.py).

The rank-sensitivity cases here pin the part of the algorithm the
SQL-replayable contract oracle cannot see: with merges [(a,b),(b,c)]
the word "abc" must become [ab, c] (rank order is load-bearing),
whereas reversed ranks give [a, bc].
"""

from __future__ import annotations

import pytest

from jsonschema_validator_spark.operators.tokenizer import (
    DEMO_MERGES,
    PRETOKEN_RE,
    BpeTokenizer,
    bpe_tokenize,
    load_merges,
)


class TestEncodeWord:
    def test_rank_order_is_load_bearing(self):
        tok = BpeTokenizer([("a", "b"), ("b", "c")])
        assert tok.encode_word("abc") == ["ab", "c"]
        tok_rev = BpeTokenizer([("b", "c"), ("a", "b")])
        assert tok_rev.encode_word("abc") == ["a", "bc"]

    def test_multi_level_merge(self):
        tok = BpeTokenizer(DEMO_MERGES)
        assert tok.encode_word("ers") == ["ers"]
        assert tok.encode_word("erers") == ["er", "ers"]
        assert tok.encode_word("ersers") == ["ers", "ers"]

    def test_collapses_every_occurrence_left_to_right(self):
        tok = BpeTokenizer([("a", "a")])
        # left-to-right non-overlapping: aaa -> [aa, a], aaaa -> [aa, aa] -> no
        # further merge unless ("aa","aa") exists
        assert tok.encode_word("aaa") == ["aa", "a"]
        assert tok.encode_word("aaaa") == ["aa", "aa"]

    def test_no_merge_applies(self):
        tok = BpeTokenizer(DEMO_MERGES)
        assert tok.encode_word("xyz") == ["x", "y", "z"]

    def test_duplicate_pair_rejected(self):
        with pytest.raises(ValueError, match="duplicate"):
            BpeTokenizer([("a", "b"), ("a", "b")])


class TestEncode:
    def test_pretokenizer_splits_contractions_digits_punct(self):
        assert PRETOKEN_RE.findall("there're 123 ok!!") == [
            "there", "'re", "123", "ok", "!!",
        ]

    def test_whitespace_never_fuses_words(self):
        tok = BpeTokenizer(DEMO_MERGES)
        # "late r" must NOT produce the "er" merge across the space
        assert tok.encode("late r") == ["l", "a", "t", "e", "r"]
        assert tok.encode("later") == ["l", "a", "t", "er"]

    def test_empty_and_none(self):
        tok = BpeTokenizer(DEMO_MERGES)
        assert tok.encode("") == []
        assert tok.encode(None) == []

    def test_cache_is_correct_not_just_fast(self):
        tok = BpeTokenizer(DEMO_MERGES)
        cache: dict[str, list[str]] = {}
        first = tok.encode("ers ers", cache)
        assert first == ["ers", "ers"]
        assert cache["ers"] == ["ers"]
        assert tok.encode("ers", cache) == ["ers"]

    def test_lowercase_mode(self):
        tok = BpeTokenizer(DEMO_MERGES, lowercase=True)
        assert tok.encode("ERS") == ["ers"]


class TestLoadMerges:
    def test_round_trip(self, tmp_path):
        p = tmp_path / "merges.txt"
        p.write_text("#version: 0.2\ne r\na n\ner s\n\n", encoding="utf-8")
        assert load_merges(str(p)) == DEMO_MERGES

    def test_malformed_line_raises(self, tmp_path):
        p = tmp_path / "merges.txt"
        p.write_text("e r extra\n", encoding="utf-8")
        with pytest.raises(ValueError, match="malformed"):
            load_merges(str(p))
        p.write_text("loner\n", encoding="utf-8")
        with pytest.raises(ValueError, match="malformed"):
            load_merges(str(p))


class TestBpeTokenizeDataFrame:
    def test_counts_match_local_encoder(self, spark):
        rows = [
            (1, "there're 123 trains"),
            (2, "ers erers late r"),
            (3, None),
            (4, ""),
            (5, "anan banana answers"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: (r["n_pretokens"], r["n_tokens"])
            for r in bpe_tokenize(df, "doc_id", "text", DEMO_MERGES).collect()
        }
        tok = BpeTokenizer(DEMO_MERGES)
        for doc_id, text in rows:
            words = PRETOKEN_RE.findall(text or "")
            assert out[doc_id] == (len(words), len(tok.encode(text))), text

    def test_with_tokens_materializes_array(self, spark):
        df = spark.createDataFrame([(1, "ers later")], "doc_id long, text string")
        row = bpe_tokenize(df, "doc_id", "text", DEMO_MERGES, with_tokens=True).collect()[0]
        assert row["tokens"] == ["ers", "l", "a", "t", "er"]
        assert row["n_tokens"] == 5

    def test_plan_is_shuffle_free(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = bpe_tokenize(df, "doc_id", "text", DEMO_MERGES)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
