"""Canonical check-suite specs. Specs are data (JSON-able dicts),
compiled at driver time — the "schemas are data" property of the
reference (SURVEY.md §1.2)."""

from __future__ import annotations

ROLES = ["system", "user", "assistant", "tool"]
TOOLS = ["search", "python", "browser", "editor", "bash"]


def transcripts_spec(
    drift_value: str = "length(text)",
    ks_threshold: float | None = None,
    psi_threshold: float = 0.2,
) -> dict:
    """The transcripts-table suite from BASELINE.json north_star: keyword
    checks (type/enum/required/pattern/min/max) over the input_hint
    columns + uniqueness, referential integrity, ordering, drift, stats."""
    drift_check = {
        "check": "drift",
        "value": drift_value,
        "buckets": 20,
        # fixed grid bounds (text length contract is [1, 8000]):
        # avoids a whole extra min/max scan before the histogram
        "lo": 0.0,
        "hi": 8200.0,
        "psi_threshold": psi_threshold,
    }
    # default KS rule is the sample-size-aware asymptotic critical value
    # (operators/drift.ks_critical_value); a flat threshold is opt-in
    if ks_threshold is not None:
        drift_check["ks_threshold"] = ks_threshold
    return {
        "name": "transcripts_v1",
        "draft": "draft7",
        "partition_by": "day",
        "keys": ["conv_id", "turn_idx"],
        "row": {
            "type": "object",
            "required": ["conv_id", "turn_idx", "role", "text", "ts"],
            "properties": {
                "conv_id": {"type": "string", "pattern": "^c\\d{10}$"},
                "turn_idx": {"type": "integer", "minimum": 0, "maximum": 1000000},
                "role": {"type": "string", "enum": ROLES},
                "text": {
                    "type": "string",
                    "minLength": 1,
                    "maxLength": 8000,
                    "pattern": "^c\\d{10}:\\d+:",
                },
                "tool": {"type": "string", "enum": TOOLS},
            },
            # tool present => role must be 'tool' (FIXTURES.md V7)
            "dependencies": {"tool": {"properties": {"role": {"enum": ["tool"]}}}},
        },
        "dataset": [
            {"check": "unique", "columns": ["conv_id", "turn_idx"]},
            {"check": "referential_root", "group": "conv_id", "order": "turn_idx"},
            {"check": "ordering", "group": "conv_id", "order": "turn_idx", "monotone": ["ts"]},
            drift_check,
            {"check": "stats", "columns": ["conv_id", "turn_idx", "role", "text", "tool"]},
        ],
    }
