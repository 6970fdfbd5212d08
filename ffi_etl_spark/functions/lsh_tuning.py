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


# Expected ambient band-candidates per document the budget tolerates
# when the corpus size is known (round 9): the verify bill is
# ~1.5× the per-doc-slot signature cost per candidate (both measured,
# operators/dedup.py::WIDE_CORPUS_DOCS derivation), so keeping
# candidates-per-doc at the order of the signature width keeps the
# quadratic term from ever dominating the linear one.
AMBIENT_CANDS_PER_DOC = 32.0


def choose_minhash_split(
    ambient: float,
    threshold: float,
    dup_sim: float = 0.9,
    recall_floor: float = 0.95,
    num_perms: tuple[int, ...] = (12, 24, 36),
    ambient_budget: float = 1e-3,
    n_docs: int | None = None,
) -> tuple[int, int, int]:
    """(num_perm, bands, rows) for a corpus whose random-pair (ambient)
    shingle similarity is known — the self-tuning companion to
    ``tune_bands`` (round 6; BASELINE.md §scaling has the measurement
    that motivated it).

    On a low-ambient corpus (real text: ambient ≈ 0) the cheapest
    signature wins — if the default split's ambient collision
    probability is already ≤ ``ambient_budget`` (≤0.1% of random pairs
    become candidates), keep it and pay nothing extra. On a
    high-ambient corpus the verify bill is candidate-count-dominated
    and grows ~n² × P(collide | ambient), so instead pick, over the
    offered signature widths and their divisor splits, the one that
    MINIMIZES ambient collision probability subject to keeping S-curve
    recall ≥ ``recall_floor`` at ``dup_sim`` — the similarity your true
    duplicates actually live at (template clones sit ≥0.9; Lee et al.
    style near-dup dedup uses 0.8), which is where recall is owed.
    Pairs in the (threshold, dup_sim) ambient band lose recall — that
    is the documented LSH trade for bounded verify cost, the same
    contract class as any banding change.

    Measured at synthetic sf1 (31-word-vocab testdata, ambient ≈0.35):
    the chosen (24, 4, 6) emits 12× fewer band candidates than the
    default (12, 3, 4) with the identical found set at j ≥ 0.9, and
    turns the 0.1→1 wall-clock ratio from 21.8× into 1.4×.

    Driver-side pure math, O(Σ divisors); falls back to the default
    split when no offered split can meet the recall floor.

    ``n_docs`` (round 9, the sf10 ladder cliff): a FIXED probability
    budget is scale-blind — P=4.5e-4 is "cheap" at 50k docs (~560k
    candidates) and a 65M-candidate disaster at 494k docs, because
    candidates grow n²·P while everything else grows n·num_perm. With
    the corpus size known, the budget becomes "≤ AMBIENT_CANDS_PER_DOC
    expected ambient candidates per document", i.e. P ≤ 2·C/n — the
    quantity that actually prices the verify stage. At gate-scale
    corpora (n ≤ 64k) this is looser than the 1e-3 default, so every
    pinned small-scale pick is unchanged."""
    if n_docs is not None and n_docs > 1:
        ambient_budget = min(
            ambient_budget, 2.0 * AMBIENT_CANDS_PER_DOC / n_docs
        )
    base = num_perms[0]
    b0, r0 = tune_bands(base, threshold, fp_weight=5)
    if (
        candidate_probability(ambient, b0, r0) <= ambient_budget
        and candidate_probability(dup_sim, b0, r0) >= recall_floor
    ):
        # fast path: the default split is cheap enough AND honors the
        # caller's recall contract at dup_sim (ADVICE r06: a stricter
        # recall_floor than the default split provides must fall into
        # the search loop even on a low-ambient corpus)
        return base, b0, r0
    best: tuple[tuple[float, int, int], tuple[int, int, int]] | None = None
    for num_perm in num_perms:
        for bands in range(1, num_perm + 1):
            if num_perm % bands:
                continue
            rows = num_perm // bands
            if candidate_probability(dup_sim, bands, rows) < recall_floor:
                continue
            amb = candidate_probability(ambient, bands, rows)
            key = (amb, num_perm, bands)
            if best is None or key < best[0]:
                best = (key, (num_perm, bands, rows))
    if best is None:
        return base, b0, r0
    return best[1]
