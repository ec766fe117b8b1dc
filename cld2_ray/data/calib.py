"""Per-(language, script-slot) expected-score calibration scales.

The expected-score table (state/model.py train(), the analogue of the
reference's kAvgDeltaOctaScore) is measured split-half on the seed
corpora: quad tables trained on the first half of each script section
score the unseen second half. That centers each cell on HELDOUT-
SENTENCE per-KB rates — but the exact ReliabilityExpected ramp
(cldutil.cc:586-605, hard 1.5x/4.0x cutoffs) must also hold for
PAGE-CHUNK text, which with seed-scale quad tables sits ~1.5-2x above
the held-out rate (pages are built from in-vocabulary words; heldout
halves are out-of-vocabulary by construction). The scales below
re-center each cell between the two populations so the exact ramp's
window covers both.

Learned by scripts/calibrate_expected.py on calibration pages
(sources.pages, seed=43 — DISJOINT from the seed-42 eval/bench
corpus) plus the per-language heldout conformance sentences; keys are
(seed-corpus code, LScript4 slot) for quad cells and (code, "uni")
for CJK unigram rates. Cells not listed keep k=1.0 (the raw
split-half measurement). Deterministic data, regenerated only by
rerunning the script.
"""

CALIB_K: dict[tuple[str, int | str], float] = {
    ('aa', 0): 0.625,
    ('ar', 2): 1.25,
    ('cs', 0): 0.875,
    ('en', 0): 0.875,
    ('he', 3): 1.5,
    ('it', 0): 1.25,
    ('na', 0): 0.75,
    ('no', 0): 0.875,
    ('pl', 0): 1.625,
    ('ro', 0): 2.25,
    ('ro', 1): 1.125,
    ('ru', 1): 1.125,
    ('sn', 0): 1.375,
    ('sr', 0): 1.125,
    ('tk', 0): 1.125,
    ('tlh', 0): 1.375,
    ('tn', 0): 1.375,
    ('tr', 0): 1.125,
    ('uk', 1): 1.125,
}
