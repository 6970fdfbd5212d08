"""LSH banding parameter selection.

The (bands, rows) split of a MinHash signature fixes the candidate
S-curve  P(candidate | jaccard=s) = 1 - (1 - s^rows)^bands.  More rows
per band sharpens selectivity (fewer false candidates to verify), more
bands raises recall; the right split depends on the similarity
threshold the caller will verify at. ``tune_bands`` picks the split
that minimizes total S-curve error mass around the threshold —
false-positive area below it (wasted verify work: at 100 TB the verify
join's row count is THE cost driver, see operators/dedup.py) plus
false-negative area above it (missed near-dups).

Driver-side pure math over O(num_perm) divisor splits — evaluated once
when a pipeline is configured, never per-row.
"""

from __future__ import annotations


def candidate_probability(s: float, bands: int, rows: int) -> float:
    """P(two docs share >=1 LSH band | true Jaccard s)."""
    return 1.0 - (1.0 - s**rows) ** bands


def curve_error(
    bands: int, rows: int, threshold: float, fp_weight: float = 1.0, grid: int = 200
) -> float:
    """Integrated S-curve error: candidate mass below the threshold
    (false positives, weighted ``fp_weight``) + missed mass above it
    (false negatives). Uniform-similarity prior — swap the grid weights
    if the corpus's similarity histogram is known."""
    err = 0.0
    for i in range(grid):
        s = (i + 0.5) / grid
        p = candidate_probability(s, bands, rows)
        if s < threshold:
            err += fp_weight * p
        else:
            err += 1.0 - p
    return err / grid

def tune_bands(
    num_perm: int, threshold: float, fp_weight: float = 1.0
) -> tuple[int, int]:
    """Best (bands, rows) with bands*rows == num_perm for a verify
    threshold. ``fp_weight > 1`` biases toward fewer candidates (cheaper
    verify, lower recall) — the knob to turn when the corpus has high
    ambient similarity and the candidate count explodes."""
    best, best_err = None, float("inf")
    for bands in range(1, num_perm + 1):
        if num_perm % bands:
            continue
        rows = num_perm // bands
        e = curve_error(bands, rows, threshold, fp_weight)
        if e < best_err:
            best, best_err = (bands, rows), e
    assert best is not None
    return best
