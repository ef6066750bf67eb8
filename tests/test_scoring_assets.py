"""Every shipped NCBI matrix file must load through the substitution-file
loader, and the embedded preset tables must equal their file-loaded twins."""

import glob
import os

import numpy as np
import pytest

from seqalign_tpu.scoring.config import ScoringConfig
from seqalign_tpu.scoring.loader import ScoringLoadError, load_matrix
from seqalign_tpu.scoring.presets import DATA_DIR

FILES = sorted(glob.glob(os.path.join(DATA_DIR, "*.txt")))


def test_have_all_78_assets():
    assert len(FILES) == 78


@pytest.mark.parametrize("path", FILES, ids=[os.path.basename(f) for f in FILES])
def test_matrix_file_loads(path):
    sc = ScoringConfig(1, -1, -4, -1)
    load_matrix(path, sc)
    assert sc._swap_set.any()
    assert not sc.use_match_mismatch
    # diagonal self-scores exist for a few common residues
    for ch in "arnd":
        if sc._swap_set[ord(ch), ord(ch)]:
            break
    else:
        # DNA matrices use acgt
        assert sc._swap_set[ord("a"), ord("a")] or sc._swap_set[ord("n"), ord("n")]


def test_blosum62_file_equals_preset_table():
    from seqalign_tpu.scoring.presets import scoring_system_BLOSUM62

    pre = scoring_system_BLOSUM62()
    sc = ScoringConfig(1, -4, -10, -1)
    load_matrix(os.path.join(DATA_DIR, "BLOSUM62.txt"), sc)
    np.testing.assert_array_equal(
        sc._swap_scores[sc._swap_set], pre._swap_scores[pre._swap_set]
    )


@pytest.mark.parametrize("bad,err", [
    ("", "Empty file"),
    ("# only comments\n", "Empty file"),
    ("1 2 3\n", "separators"),
    ("  a c\na 1\n", "Missing number"),
    ("  a c\na 1 2 3\n", "Too many columns"),
])
def test_matrix_loader_errors(bad, err):
    import io

    sc = ScoringConfig(1, -1, -4, -1)
    with pytest.raises(ScoringLoadError, match=err):
        load_matrix(io.StringIO(bad), sc)
