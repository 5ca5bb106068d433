"""Dataset-level checks and training-pipeline operators.

These generalize the reference's per-document keyword semantics to whole
tables (SURVEY.md §2.4): uniqueness generalizes uniqueItems, referential
integrity generalizes $ref-must-resolve, enum membership generalizes enum,
column stats generalize required/min/max — plus the drift, dedup,
similarity, and text operators a 100 TB training-data pipeline needs.
"""
