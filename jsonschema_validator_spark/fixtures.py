"""Deterministic transcripts fixture generator (FIXTURES.md §1).

Synthesizes the `input_hint` table shape — (conv_id string, turn_idx int,
role string, text string, tool string, ts timestamp) plus a `day`
partition column — with Zipf-skewed conversation lengths (hot-key skew is
load-bearing for the salted-agg tests) and, for the dirty variant, an
injected violation catalog V1..V10 recorded as an expected_violations
companion table.

Everything is seeded numpy / pyarrow — no wall clock, no uuid, no
external data (SURVEY.md §7 determinism note). String payloads are built
zero-copy via pyarrow buffer construction so the bench-scale fixture
(~4M turns) generates in seconds.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
ROLES = ("system", "user", "assistant", "tool")
TOOLS = ("search", "python", "browser", "editor", "bash")
BASE_TS = np.datetime64("2026-01-01T00:00:00")

SCALES = {
    # n_convs, whales (count, len)
    "tiny": dict(n_convs=100, whales=1, whale_len=500),
    "small": dict(n_convs=5_000, whales=3, whale_len=5_000),
    "bench": dict(n_convs=200_000, whales=3, whale_len=5_000),
    # scaling-bench scale: big enough that the fully-parallel work
    # dominates fixed per-job overhead at 32 cores (~25M turns)
    "bench4": dict(n_convs=800_000, whales=12, whale_len=5_000),
}


def _segment_cumsum(values: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Per-segment cumulative sum: cumsum reset at each segment start."""
    c = np.cumsum(values)
    offsets = np.zeros_like(c)
    offsets[seg_starts[1:]] = c[seg_starts[1:] - 1]
    return c - np.maximum.accumulate(offsets)


def _random_ascii_array(rng: np.random.Generator, lengths: np.ndarray) -> pa.Array:
    """Variable-length random lowercase ASCII strings, built directly from
    an offsets + data buffer (no per-row Python). Returns large_string so
    >2 GB of total payload works (parquet writes the identical BYTE_ARRAY
    physical type either way; Spark reads it back as StringType)."""
    total = int(lengths.sum())
    data = rng.integers(97, 123, size=total, dtype=np.uint8)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.LargeStringArray.from_buffers(
        len(lengths), pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())
    )


@dataclass
class Fixture:
    table: pa.Table
    expected_violations: pa.Table | None  # (conv_id, turn_idx, violation_id, column, keyword)


def generate_transcripts(
    scale: str = "tiny", seed: int = SEED, dirty: bool = False
) -> Fixture:
    cfg = SCALES[scale]
    rng = np.random.default_rng(seed)

    # conversation lengths: Zipf(a=1.5) clipped to [1, 400] + whale convs
    n_convs = cfg["n_convs"]
    lens = np.clip(rng.zipf(1.5, size=n_convs), 1, 400)
    lens[:: max(1, n_convs // cfg["whales"])][: cfg["whales"]] = cfg["whale_len"]
    n = int(lens.sum())

    conv_idx = np.repeat(np.arange(n_convs), lens)
    seg_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    turn_idx = (np.arange(n) - seg_starts[conv_idx]).astype(np.int32)

    # roles: turn 0 = system; elsewhere deterministic tool marks (~15% of
    # assistant turns are followed by a tool row), user/assistant alternate
    # over non-tool positions
    mix = (conv_idx * 2654435761 + turn_idx * 40503) % 100
    tool_mark = (mix < 7) & (turn_idx > 0)
    marks_cum = _segment_cumsum(tool_mark.astype(np.int64), seg_starts)
    alt = (turn_idx - marks_cum) % 2
    role = np.where(
        turn_idx == 0, 0, np.where(tool_mark, 3, np.where(alt == 1, 1, 2))
    )  # 0=system 1=user 2=assistant 3=tool

    # tool column: null unless role==tool
    tool_choice = (conv_idx * 97 + turn_idx * 13) % len(TOOLS)
    tool_vals = np.array(TOOLS)[tool_choice]
    tool_col = pa.array(
        np.where(role == 3, tool_vals, None), type=pa.string(), from_pandas=True
    )

    # ts: base + conv offset (spread over ~14 days) + 1..30s per turn
    conv_day_offset = (np.arange(n_convs) % 14).astype("timedelta64[D]")
    conv_sec_offset = ((np.arange(n_convs) * 9973) % 86_400).astype("timedelta64[s]")
    incr = rng.integers(1, 31, size=n).astype(np.int64)
    within = _segment_cumsum(incr, seg_starts).astype("timedelta64[s]")
    ts = BASE_TS + conv_day_offset[conv_idx] + conv_sec_offset[conv_idx] + within
    day = ts.astype("datetime64[D]").astype(str)

    # text: "c{conv:010d}:{turn}:" prefix + lognormal-length ASCII payload
    text_len = np.clip(rng.lognormal(5.0, 1.0, size=n), 1, 8000).astype(np.int64)
    payload = _random_ascii_array(rng, text_len)
    conv_ids = np.char.add("c", np.char.zfill(conv_idx.astype(str), 10))
    prefix = pa.array(
        np.char.add(
            np.char.add(np.char.add(conv_ids, ":"), turn_idx.astype(str)), ":"
        )
    ).cast(pa.large_string())
    import pyarrow.compute as pc

    text = pc.binary_join_element_wise(prefix, payload, pa.scalar("", type=pa.large_string()))

    table = pa.table(
        {
            "conv_id": pa.array(conv_ids),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(np.array(ROLES)[role]),
            "text": text,
            "tool": tool_col,
            "ts": pa.array(ts.astype("datetime64[us]")),
            "day": pa.array(day),
        }
    )

    if not dirty:
        return Fixture(table, None)
    return _inject_violations(table, rng)


def _inject_violations(table: pa.Table, rng: np.random.Generator) -> Fixture:
    """Apply the violation catalog V1..V10 (FIXTURES.md §1) at deterministic
    keys; return the dirty table + the expected_violations companion."""
    import pyarrow.compute as pc

    df = table.to_pandas()
    n = len(df)
    exp: list[tuple[str, int, str, str, str]] = []
    used: set[int] = set()

    def pick(k: int, lo: int = 0) -> np.ndarray:
        """Deterministic spread of k fresh row indices; injections must be
        disjoint so one row never carries two catalog entries (the
        expected_violations keys would drift otherwise)."""
        out: list[int] = []
        stride = max(1, (n - lo - 1) // max(k, 1))
        i = lo
        while len(out) < k:
            j = i
            while j in used:
                j += 1
            out.append(j)
            used.add(j)
            i += stride
        return np.array(out, dtype=np.int64)

    # V1: duplicate (conv_id, turn_idx) rows — 20 pairs, incl. whale rows
    dup_idx = pick(20)
    dup_rows = df.iloc[dup_idx].copy()
    for _, r in dup_rows.iterrows():
        exp.append((r.conv_id, int(r.turn_idx), "V1", "conv_id,turn_idx", "unique"))

    # V2: orphan conversations — rewrite conv_id of 10 rows to fresh ids with
    # turn_idx>0 and no turn 0
    orph_idx = pick(10, lo=5)
    for j, i in enumerate(orph_idx):
        cid = f"c99999000{j:02d}"
        df.loc[df.index[i], "conv_id"] = cid
        if df.loc[df.index[i], "turn_idx"] == 0:
            df.loc[df.index[i], "turn_idx"] = np.int32(1)
        df.loc[df.index[i], "text"] = (
            f"{cid}:{df.loc[df.index[i], 'turn_idx']}:orphan"
        )
        exp.append((cid, int(df.loc[df.index[i], "turn_idx"]), "V2", "conv_id", "referential"))

    # V3: role outside enum
    role_idx = pick(8, lo=11)
    for i in role_idx:
        df.loc[df.index[i], "role"] = "operator"
        exp.append((df.iloc[i].conv_id, int(df.iloc[i].turn_idx), "V3", "role", "enum"))

    # V4: null text and empty text
    null_idx = pick(6, lo=23)
    for k, i in enumerate(null_idx):
        df.loc[df.index[i], "text"] = None if k % 2 == 0 else ""
        kw = "required" if k % 2 == 0 else "minLength"
        exp.append((df.iloc[i].conv_id, int(df.iloc[i].turn_idx), "V4", "text", kw))

    # V5: text longer than 8000 chars
    long_idx = pick(4, lo=37)
    for i in long_idx:
        r = df.iloc[i]
        df.loc[df.index[i], "text"] = f"{r.conv_id}:{r.turn_idx}:" + "x" * 8100
        exp.append((r.conv_id, int(r.turn_idx), "V5", "text", "maxLength"))

    # V6: corrupted prefix (pattern violation)
    pat_idx = pick(7, lo=51)
    for i in pat_idx:
        r = df.iloc[i]
        df.loc[df.index[i], "text"] = "CORRUPT:" + str(r.text)[:40]
        exp.append((r.conv_id, int(r.turn_idx), "V6", "text", "pattern"))

    # V7: tool non-null on a user row; tool value outside enum
    tool_idx = pick(6, lo=67)
    for k, i in enumerate(tool_idx):
        if k % 2 == 0:
            df.loc[df.index[i], "role"] = "user"
            df.loc[df.index[i], "tool"] = "search"
            exp.append((df.iloc[i].conv_id, int(df.iloc[i].turn_idx), "V7", "tool", "dependencies"))
        else:
            df.loc[df.index[i], "role"] = "tool"
            df.loc[df.index[i], "tool"] = "teleport"
            exp.append((df.iloc[i].conv_id, int(df.iloc[i].turn_idx), "V7", "tool", "enum"))

    # V8: turn_idx gaps (dense break) — bump turn_idx of the LAST turn of
    # 5 conversations by +3 (skip rows already carrying another violation)
    conv_last = df.groupby("conv_id")["turn_idx"].idxmax()
    eligible = [
        i for cid, i in conv_last.items()
        if i not in used and not str(cid).startswith("c99999")
    ]
    some_convs = [eligible[j * (len(eligible) - 1) // 4] for j in range(5)]
    used.update(some_convs)
    for i in some_convs:
        r = df.loc[i]
        new_t = int(r.turn_idx) + 3
        df.loc[i, "turn_idx"] = np.int32(new_t)
        df.loc[i, "text"] = f"{r.conv_id}:{new_t}:gap"
        exp.append((r.conv_id, new_t, "V8", "turn_idx", "ordering"))

    # V10: turn_idx out of bounds
    b_idx = pick(4, lo=83)
    for k, i in enumerate(b_idx):
        r = df.iloc[i]
        new_t = -1 if k % 2 == 0 else 2_000_000
        df.loc[df.index[i], "turn_idx"] = np.int32(new_t)
        df.loc[df.index[i], "text"] = f"{r.conv_id}:{new_t}:bounds"
        kw = "minimum" if new_t < 0 else "maximum"
        exp.append((r.conv_id, new_t, "V10", "turn_idx", kw))

    # V9: one drift day — append rows whose text lengths come from a
    # shifted lognormal (mu=6) under a fresh day partition
    n_drift = max(200, n // 50)
    drift_len = np.clip(rng.lognormal(6.0, 1.0, size=n_drift), 1, 8000).astype(np.int64)
    drift_payload = _random_ascii_array(rng, drift_len)
    drift_conv = np.array([f"c {i:09d}".replace(" ", "8") for i in range(n_drift)])
    drift_rows = {
        "conv_id": pa.array(drift_conv),
        "turn_idx": pa.array(np.zeros(n_drift, dtype=np.int32)),
        "role": pa.array(np.full(n_drift, "system")),
        "text": pc.binary_join_element_wise(
            pa.array([f"{c}:0:" for c in drift_conv]).cast(pa.large_string()),
            drift_payload,
            pa.scalar("", type=pa.large_string()),
        ),
        "tool": pa.array([None] * n_drift, type=pa.string()),
        "ts": pa.array(
            np.full(n_drift, BASE_TS + np.timedelta64(20, "D")).astype("datetime64[us]")
        ),
        "day": pa.array(np.full(n_drift, "2026-01-21")),
    }

    dirty = pa.concat_tables(
        [
            pa.Table.from_pandas(df, schema=table.schema, preserve_index=False),
            pa.Table.from_arrays(list(dup_rows_to_arrays(dup_rows, table.schema)), schema=table.schema),
            pa.table(drift_rows, schema=table.schema),
        ]
    )
    exp_table = pa.table(
        {
            "conv_id": pa.array([e[0] for e in exp]),
            "turn_idx": pa.array([e[1] for e in exp], type=pa.int32()),
            "violation_id": pa.array([e[2] for e in exp]),
            "column": pa.array([e[3] for e in exp]),
            "keyword": pa.array([e[4] for e in exp]),
        }
    )
    return Fixture(dirty, exp_table)


def dup_rows_to_arrays(dup_rows, schema):
    t = pa.Table.from_pandas(dup_rows, preserve_index=False)
    for f in schema:
        yield t.column(f.name).cast(f.type)


def write_fixture(
    out_dir: str, scale: str = "small", seed: int = SEED, variant: str = "both"
) -> dict:
    """Write clean and/or dirty variants (and the expected_violations
    companion for dirty). Returns the paths. Idempotent for a given
    (scale, seed). variant: 'both' | 'clean' | 'dirty' — the scaling
    bench only needs 'clean' (violation injection routes through pandas
    and dominates generation time at large scales; the ~70 injected rows
    don't change benchmark cost)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    # small row groups (~16 MB) => fine-grained scan splits: a 32-core
    # scan stage gets several waves of balanced tasks instead of 1.6
    # ragged waves of 32 MB splits
    rg = 64 * 1024
    if variant in ("both", "clean"):
        clean = generate_transcripts(scale, seed=seed, dirty=False)
        paths["clean"] = os.path.join(out_dir, f"transcripts_clean_{scale}.parquet")
        pq.write_table(clean.table, paths["clean"], row_group_size=rg)
    if variant in ("both", "dirty"):
        dirty = generate_transcripts(scale, seed=seed, dirty=True)
        paths["dirty"] = os.path.join(out_dir, f"transcripts_dirty_{scale}.parquet")
        pq.write_table(dirty.table, paths["dirty"], row_group_size=rg)
        paths["expected"] = os.path.join(out_dir, f"expected_violations_{scale}.parquet")
        pq.write_table(dirty.expected_violations, paths["expected"])
    return paths
