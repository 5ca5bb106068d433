"""Author-independent oracle for ``format: duration`` (VERDICT r3 #4).

The container has no library duration checker (isoduration absent), so
independence comes from TWO derivations of the same spec text that must
agree everywhere:

1. The engine's ``DURATION_ABNF_PATTERN`` regex
   (functions/keywords.py) — written as a regex.
2. ``abnf_duration`` below — a recursive-descent parser transliterated
   production-by-production from RFC 3339 appendix A, one function per
   nonterminal, no regex anywhere.

They are checked against each other on the full structural product
space (every subset of Y/M/D x H/M/S with and without the "T"), on the
hand-pinned corpus vectors, and on hypothesis-fuzzed strings over the
duration alphabet.

Grammar (RFC 3339 appendix A):

    dur-second = 1*DIGIT "S"
    dur-minute = 1*DIGIT "M" [dur-second]
    dur-hour   = 1*DIGIT "H" [dur-minute]
    dur-time   = "T" (dur-hour / dur-minute / dur-second)
    dur-day    = 1*DIGIT "D"
    dur-week   = 1*DIGIT "W"
    dur-month  = 1*DIGIT "M" [dur-day]
    dur-year   = 1*DIGIT "Y" [dur-month]
    dur-date   = (dur-day / dur-month / dur-year) [dur-time]
    duration   = "P" (dur-date / dur-time / dur-week)

Designators are pinned uppercase (ISO 8601 3.4.1 and every deployed
checker), a documented narrowing of RFC 5234's nominally
case-insensitive quoted strings.
"""

from __future__ import annotations

import itertools
import json
import re
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

from jsonschema_validator_spark.functions.keywords import DURATION_ABNF_PATTERN

DURATION_RE = re.compile(DURATION_ABNF_PATTERN)


# --- verbatim recursive-descent transliteration ---------------------------
# Each function takes (s, i) and returns the index after the consumed
# production, or None if the production does not match at i.

def _digits(s: str, i: int) -> int | None:  # 1*DIGIT
    j = i
    while j < len(s) and s[j].isdigit() and s[j].isascii():
        j += 1
    return j if j > i else None


def _unit(s: str, i: int, letter: str) -> int | None:  # 1*DIGIT <letter>
    j = _digits(s, i)
    if j is None or j >= len(s) or s[j] != letter:
        return None
    return j + 1


def _dur_second(s: str, i: int) -> int | None:
    return _unit(s, i, "S")


def _dur_minute(s: str, i: int) -> int | None:
    j = _unit(s, i, "M")
    if j is None:
        return None
    k = _dur_second(s, j)
    return k if k is not None else j


def _dur_hour(s: str, i: int) -> int | None:
    j = _unit(s, i, "H")
    if j is None:
        return None
    k = _dur_minute(s, j)
    return k if k is not None else j


def _dur_time(s: str, i: int) -> int | None:
    if i >= len(s) or s[i] != "T":
        return None
    i += 1
    for prod in (_dur_hour, _dur_minute, _dur_second):
        j = prod(s, i)
        if j is not None:
            return j
    return None


def _dur_day(s: str, i: int) -> int | None:
    return _unit(s, i, "D")


def _dur_week(s: str, i: int) -> int | None:
    return _unit(s, i, "W")


def _dur_month(s: str, i: int) -> int | None:
    j = _unit(s, i, "M")
    if j is None:
        return None
    k = _dur_day(s, j)
    return k if k is not None else j


def _dur_year(s: str, i: int) -> int | None:
    j = _unit(s, i, "Y")
    if j is None:
        return None
    k = _dur_month(s, j)
    return k if k is not None else j


def _dur_date(s: str, i: int) -> int | None:
    for prod in (_dur_day, _dur_month, _dur_year):
        j = prod(s, i)
        if j is not None:
            k = _dur_time(s, j)
            return k if k is not None else j
    return None


def abnf_duration(s: str) -> bool:
    """True iff ``s`` is in the language of the ``duration`` production."""
    if not s or s[0] != "P":
        return False
    for prod in (_dur_date, _dur_time, _dur_week):
        j = prod(s, 1)
        if j == len(s):
            return True
    return False


# --- ambiguity note: dur-date tries dur-day first; since day/month/year
# start with the same 1*DIGIT but end with distinct letters, at most one
# alternative can consume the prefix, so first-match is not lossy. The
# one real ambiguity ("M" = month or minute) is resolved by the "T"
# gate, exactly as in the grammar.


def _structural_vectors() -> list[str]:
    """Every subset of Y/M/D x H/M/S with and without the T separator,
    plus week combinations — the full structural product space."""
    out = []
    date_parts = [("1Y", "2M", "3D")[i] for i in range(3)]
    time_parts = [("4H", "5M", "6S")[i] for i in range(3)]
    for dmask in itertools.product([0, 1], repeat=3):
        date = "".join(p for p, m in zip(date_parts, dmask) if m)
        for t in (0, 1):
            for tmask in itertools.product([0, 1], repeat=3):
                time = "".join(p for p, m in zip(time_parts, tmask) if m)
                out.append("P" + date + ("T" if t else "") + time)
    for w in ("P1W", "P1W2D", "P1Y1W", "PT1W", "P1WT1S", "P1W2W", "PW"):
        out.append(w)
    return sorted(set(out))


def test_regex_agrees_with_parser_on_structural_space():
    for s in _structural_vectors():
        assert bool(DURATION_RE.match(s)) == abnf_duration(s), s


def test_hierarchy_is_load_bearing():
    # derivable chains
    for s in ("P1Y2M3DT4H5M6S", "P1Y2M", "P2M3D", "P1DT5M6S", "PT1H30M"):
        assert abnf_duration(s) and DURATION_RE.match(s), s
    # skipped middles are not derivable
    for s in ("P1Y1D", "PT1H5S", "P1Y3DT4H", "P1DT4H6S"):
        assert not abnf_duration(s) and not DURATION_RE.match(s), s


def test_corpus_vectors_match_parser():
    """The corpus file is the contract; the parser re-derives every
    string vector independently of the regex."""
    corpus = json.loads(
        (Path(__file__).parent / "corpus" / "draft2019_format.json").read_text()
    )
    groups = [g for g in corpus if "duration" in g["description"]]
    assert groups, "duration corpus group missing"
    checked = 0
    for g in groups:
        for case in g["tests"]:
            if not isinstance(case["data"], str):
                continue  # non-strings pass format vacuously (engine semantics)
            assert abnf_duration(case["data"]) == case["valid"], case
            assert bool(DURATION_RE.match(case["data"])) == case["valid"], case
            checked += 1
    assert checked >= 40, checked


@settings(max_examples=2000, deadline=None)
@given(st.text(alphabet="PTYMDHSW0123456789.pw ", max_size=12))
def test_fuzz_regex_equals_parser(s):
    assert bool(DURATION_RE.match(s)) == abnf_duration(s), s
