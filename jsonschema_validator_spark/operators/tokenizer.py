"""Deterministic vocab-file-driven BPE tokenizer (VERDICT r3 #7).

Replaces the whitespace/regex token-count HEURISTICS in
``operators/textstats.py`` for budgeting work that needs real subword
counts: packing, context truncation, and token-budget mixture planning
all consume a token-count column, and a heuristic count propagates its
error into every downstream budget.

Algorithm — canonical greedy BPE (the GPT-2 ``bpe()`` loop):

1. Pre-tokenize with the GPT-2-style regex (contractions, letter runs,
   digit runs, punctuation runs). Whitespace itself is dropped — this
   engine counts content tokens; a deployment that needs byte-exact
   GPT-2 parity adds the space-prefix convention in the regex.
2. Split each pre-token into characters.
3. Repeatedly merge the adjacent pair with the LOWEST merge rank until
   no adjacent pair is in the merge table. Rank order is load-bearing:
   for merges [(a,b),(b,c)] the word "abc" becomes [ab, c], never
   [a, bc].

Execution shape: ``mapInPandas`` (Arrow batches through the Python
worker) with a per-partition word->tokens memo. Natural text is
Zipfian, so the memo turns the per-partition cost from
O(occurrences x word_len^2) into O(distinct_words x word_len^2) — the
same trick the reference tokenizers (GPT-2 encoder.py's ``cache``) use.
No per-row Python UDFs; the loop runs over a pandas batch.

At 100 TB the stage is embarrassingly parallel (no shuffle: one
projection in, one out), CPU-bound in the Python workers, so
parallelism follows input partitions — pair it with an explicit
``repartition`` when upstream partitions are byte-small but row-heavy
(the similarity-stage lesson in BENCH/BASELINE.md).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# GPT-2-style pre-tokenizer (same pattern family as
# textstats.bpe_ish_token_count, which this module supersedes for
# budgeting): contractions | letter runs | digit runs | punct runs.
PRETOKEN_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")

# Contract-demo merge table. The pairs are chosen so the greedy result
# is PROVABLY order-independent and replayable by pure substring
# arithmetic (the DuckDB oracle): letter sets {e,r,s} and {a,n} are
# disjoint, no pair's right element is another pair's left element
# except the explicit second-level ("er","s"), and an "ers" substring
# ALWAYS becomes [er]+[s] -> [ers] because rank0 fires before rank2 and
# no other pair can consume the 'e', 'r' or 's'. Hence for any word:
#   n_tokens = n_chars - #"er" - #"an" - #"ers"   (literal counts).
# A production deployment swaps in a real merges.txt via load_merges();
# the algorithm is rank-general (see tests for rank-sensitive cases).
DEMO_MERGES: list[tuple[str, str]] = [("e", "r"), ("a", "n"), ("er", "s")]


def load_merges(path: str) -> list[tuple[str, str]]:
    """Parse a GPT-2-format ``merges.txt``: one space-separated pair per
    line, rank = line order; ``#version`` header and blank lines are
    skipped. The file IS the vocabulary contract — two runs with the
    same file tokenize identically on any cluster."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            left, sep, right = line.partition(" ")
            if not sep or not left or not right or " " in right:
                raise ValueError(f"malformed merges line: {line!r}")
            merges.append((left, right))
    return merges


class BpeTokenizer:
    """Greedy lowest-rank-first BPE over an ordered merge list."""

    def __init__(self, merges: list[tuple[str, str]], lowercase: bool = False):
        self.ranks: dict[tuple[str, str], int] = {
            tuple(pair): rank for rank, pair in enumerate(merges)
        }
        if len(self.ranks) != len(merges):
            raise ValueError("duplicate pair in merge list")
        self.lowercase = lowercase

    def encode_word(self, word: str) -> list[str]:
        """The canonical BPE loop: start from characters, repeatedly
        merge the lowest-ranked adjacent pair."""
        parts = list(word)
        while len(parts) > 1:
            best_rank, best_i = None, -1
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            merged = parts[best_i] + parts[best_i + 1]
            # collapse EVERY occurrence of this pair left-to-right, as
            # the reference algorithm does, before rescanning for the
            # next-lowest rank
            out, i, pair = [], 0, (parts[best_i], parts[best_i + 1])
            while i < len(parts):
                if i < len(parts) - 1 and (parts[i], parts[i + 1]) == pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        return parts

    def encode(self, text: str | None, cache: dict[str, list[str]] | None = None) -> list[str]:
        if not text:
            return []
        if self.lowercase:
            text = text.lower()
        cache = cache if cache is not None else {}
        out: list[str] = []
        for word in PRETOKEN_RE.findall(text):
            toks = cache.get(word)
            if toks is None:
                toks = self.encode_word(word)
                cache[word] = toks
            out.extend(toks)
        return out


def bpe_tokenize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    lowercase: bool = False,
    with_tokens: bool = False,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Arrow-batched BPE over a text column: (id, [passthrough...],
    n_pretokens, n_tokens [, tokens]). ``with_tokens=False`` (the
    budgeting path) keeps the output row narrow — at corpus scale the
    token array is ~4x the text itself and only debuggers want it
    materialized. ``passthrough`` carries extra columns through the
    Arrow batch so downstream budgeting (token_budget_rates on a
    source column) needs NO join-back shuffle against the input."""
    passthrough = [c for c in (passthrough or []) if c not in (id_col, text_col)]
    by_name = {f.name: f for f in df.schema.fields}
    parts = [f"{id_col} long"]
    parts += [f"{c} {by_name[c].dataType.simpleString()}" for c in passthrough]
    parts += ["n_pretokens long", "n_tokens long"]
    if with_tokens:
        parts.append("tokens array<string>")
    schema = ", ".join(parts)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = BpeTokenizer(merges, lowercase=lowercase)
        cache: dict[str, list[str]] = {}  # persists across batches in a partition
        for pdf in it:
            ids, n_pre, n_tok, toks = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                text = t if isinstance(t, str) else ("" if t is None else str(t))
                if lowercase:
                    text = text.lower()
                words = PRETOKEN_RE.findall(text)
                encoded: list[str] = []
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = tok.encode_word(w)
                        cache[w] = got
                    encoded.extend(got)
                ids.append(int(i))
                n_pre.append(len(words))
                n_tok.append(len(encoded))
                if with_tokens:
                    toks.append(encoded)
            data = {id_col: pd.array(ids, dtype="int64")}
            for c in passthrough:
                data[c] = pdf[c].reset_index(drop=True)
            data["n_pretokens"] = pd.array(n_pre, dtype="int64")
            data["n_tokens"] = pd.array(n_tok, dtype="int64")
            if with_tokens:
                data["tokens"] = toks
            yield pd.DataFrame(data)

    return df.select(id_col, *passthrough, text_col).mapInPandas(batches, schema)
