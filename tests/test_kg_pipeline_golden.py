"""Hard correctness gate for the flagship composite query (r03 verdict
next-step #2): ``kg_pipeline_triples`` at sf0.001 must reproduce the
committed golden snapshot row-for-row — any semantic drift in ANY stage
of the pipeline (clean -> annotate -> candidates -> rank -> pairs ->
triples) fails loudly here, not just on row count.

The golden was produced by the pipeline itself (it is a regression pin,
not an independent oracle — every individual stage has its own oracle or
parity test); the pinned sha256 additionally guards the golden file
against accidental edits.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import __spark_entry__ as entrymod

GOLDEN = Path(__file__).parent / "golden" / "kg_pipeline_sf0001.tsv"
GOLDEN_SHA = "d7c131cab860eca4272880326e2a17976125c82ff94c0160508913f4353b1765"
SF = "/root/testdata/sf0.001"


def test_golden_file_unchanged():
    blob = GOLDEN.read_bytes()
    assert hashlib.sha256(blob).hexdigest() == GOLDEN_SHA, (
        "committed golden snapshot was modified; regenerate deliberately and "
        "update GOLDEN_SHA in the same commit"
    )


LDA_GOLDEN = Path(__file__).parent / "golden" / "lda_topics_sf0001.tsv"
LDA_GOLDEN_SHA = "5dacb7a53f85ea14197f6792330864a16ec6119ee931fea59c6efd4e4bffc987"


def test_lda_golden_file_unchanged():
    blob = LDA_GOLDEN.read_bytes()
    assert hashlib.sha256(blob).hexdigest() == LDA_GOLDEN_SHA


def test_lda_topics_matches_golden(spark):
    """lda_topics is the one driver query that stays rows-only (seeded ML,
    no SQL oracle); this sf0.001 row-for-row pin (r04 verdict next-step #7)
    makes semantic drift fail loudly anyway. Assignment verified stable
    across sessions AND parallelism levels (local[4]/sp=8 vs local[8]/sp=32)
    before pinning."""
    df = entrymod.queries()["lda_topics"](spark, SF)
    got = sorted("\t".join(str(c) for c in r) for r in df.collect())
    want = LDA_GOLDEN.read_text().splitlines()
    assert got == want


def test_kg_pipeline_matches_golden(spark):
    df = entrymod.queries()["kg_pipeline_triples"](spark, SF)
    got = sorted("\t".join(str(c) for c in r) for r in df.collect())
    want = GOLDEN.read_text().splitlines()
    assert len(got) == len(want), f"triple count {len(got)} != golden {len(want)}"
    diffs = [(g, w) for g, w in zip(got, want) if g != w]
    assert not diffs, f"{len(diffs)} rows differ from golden; first: {diffs[:3]}"
