"""Golden tests vs the reference pipeline (SURVEY.md §4.2; BASELINE.json
"bit-identical SAM + error-profile output vs PARA-suite on its test FASTQ").

The reference mount /root/reference was EMPTY when this engine was built
(SURVEY.md header). These tests activate automatically once it is populated:
they locate bundled test data and flag the calibration work (SURVEY.md §8)
instead of silently passing.
"""

import os
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")


def _reference_files():
    if not REFERENCE.exists():
        return []
    return [p for p in REFERENCE.rglob("*") if p.is_file()]


reference_present = pytest.mark.skipif(
    not _reference_files(),
    reason="/root/reference is an empty mount (SURVEY.md header); golden "
           "concordance tests activate when the reference appears")


@reference_present
def test_reference_mounted_needs_calibration():
    """When the reference appears, this test fails loudly with the §8
    checklist so concordance calibration cannot be forgotten."""
    files = _reference_files()
    fastqs = [p for p in files if p.suffix in (".fastq", ".fq")]
    pytest.fail(
        f"/root/reference now has {len(files)} files "
        f"({len(fastqs)} FASTQ). Run SURVEY.md §8: extract the reference "
        "scoring formula + .errorprofile format, capture golden SAM/profile "
        "outputs on its test FASTQ, and turn this into a byte-comparison "
        "test against parasuite_tpu's twopass output.")
