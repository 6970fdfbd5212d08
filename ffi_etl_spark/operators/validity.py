"""Validity cascade + valid/invalid split (SURVEY.md §2.11, §2.2 P2/P3).

Reference: transform_alchemer_data.py:201-224 builds ``Is_Invalid`` with
a first-match-wins ``when`` chain — admin override beats survey status
beats test-link beats geo check; rollup_alchemer_data.py:74-81 then
splits on ``== "Valid"`` / ``!= "Valid"``.

The cascade is parametrized so the same operator serves the survey
schema and any analog (the oracle queries map it onto ``orders``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validity_cascade(
    admin_comments: Column,
    completion_status: Column,
    link_used: Column,
    country: Column,
    complete_value: str = "Complete",
    usa_value: str = "United States",
) -> Column:
    """First-match-wins Is_Invalid column (transform_alchemer_data.py:201-224)."""
    return (
        F.when(
            (F.upper(admin_comments) == "OK") | (F.upper(admin_comments) == "VALID"),
            "Valid",
        )
        .when(completion_status == "Partial", "Survey status is partially completed")
        .when(completion_status == "Disqualified", "Disqualified in Alchemer")
        .when(
            completion_status != complete_value,
            F.concat(F.lit("Survey status is "), completion_status),
        )
        .when((link_used == "Test link") | (link_used == "Test"), "Survey was submitted via test link")
        .when(country != usa_value, "IP address outside USA")
        .otherwise("Valid")
    )


def split_valid(df: DataFrame, flag_col: str = "Is_Invalid") -> tuple[DataFrame, DataFrame]:
    """(valid, invalid) partition (rollup_alchemer_data.py:74-81).
    Note the reference's asymmetry: NULL flags fall into NEITHER side
    (``==`` and ``!=`` are both null-false); preserved."""
    return (
        df.filter(F.col(flag_col) == "Valid"),
        df.filter(F.col(flag_col) != "Valid"),
    )
