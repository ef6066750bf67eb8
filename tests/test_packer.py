"""Native batch packer vs the numpy reference implementation: the two
must be bit-identical for every input class the engine feeds them
(io/packer.py; the pack is the host side of the scaling contract,
SCALING.json)."""

import numpy as np
import pytest

from seqalign_tpu.io import packer
from seqalign_tpu.ops import dp
from seqalign_tpu.scoring.presets import (
    scoring_system_BLOSUM62, scoring_system_default,
)


def _cases():
    rng = np.random.default_rng(7)
    long = "".join(rng.choice(list("acgtACGTnN"), 3000))
    return [
        (["acgt", "tt", "", "ACGTACGT"], 8),
        ([""], 4),
        (["a" * 64] * 5, 64),
        ([long, "acgt"], 4096),
        ([b"acgt", b"", b"NNNN"], 8),
        ([bytearray(b"xyzw"), bytearray(b"q")], 16),
    ]


@pytest.mark.parametrize("fold_case", [None, "default", "blosum"])
def test_pack_matches_numpy(fold_case):
    sc = {"default": scoring_system_default,
          "blosum": scoring_system_BLOSUM62}.get(fold_case)
    fold = sc().luts()[0] if sc else None
    for seqs, L in _cases():
        if isinstance(seqs[0], bytearray):
            # numpy reference handles bytes-likes via the bytes branch
            ref = packer._pack_numpy([bytes(s) for s in seqs], L, fold)
        else:
            ref = packer._pack_numpy(seqs, L, fold)
        got = packer.pack(seqs, L, fold)
        assert np.array_equal(got[0], ref[0])
        assert np.array_equal(got[1], ref[1])


def test_pack_native_is_used():
    # the native extension must actually build in this environment —
    # otherwise the scaling contract silently regresses to numpy speed
    assert packer.available()


def test_fold_bytes_matches_gather():
    fold = scoring_system_default().luts()[0]
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(37, 129), dtype=np.uint8)
    assert np.array_equal(packer.fold_bytes(arr, fold), fold[arr])
    # non-contiguous input falls back to the gather
    sl = arr[:, ::2]
    assert np.array_equal(packer.fold_bytes(sl, fold), fold[sl])


def test_pad_batch_with_fold_equals_compact_mm():
    sc = scoring_system_default()
    seqs = ["acgtACGT", "ttt", "", "nacgtn"]
    a, na = dp.pad_batch(seqs)
    ac_ref, _ = (sc.luts()[0][a], None)
    ac, na2 = dp.pad_batch(seqs, fold=sc.luts()[0])
    assert np.array_equal(ac, ac_ref)
    assert np.array_equal(na, na2)


def test_pack_inputs_mm_matches_two_step():
    sc = scoring_system_default()
    sa = ["acgt", "ggg", "acgtacgtacgt"]
    sb = ["ttna", "c", ""]
    ac, bc, na, nb = dp.pack_inputs_mm(sc, sa, sb, 16, 8)
    a, na2 = dp.pad_batch(sa, 16)
    b, nb2 = dp.pad_batch(sb, 8)
    ac2, bc2 = dp.compact_inputs_mm(sc, a, b)
    assert np.array_equal(ac, ac2) and np.array_equal(bc, bc2)
    assert np.array_equal(na, na2) and np.array_equal(nb, nb2)


def test_non_latin1_raises_like_numpy():
    with pytest.raises(UnicodeEncodeError):
        packer._pack_numpy(["ሴabc"], 8, None)
    with pytest.raises((UnicodeEncodeError, ValueError)):
        packer.pack(["ሴabc"], 8, None)


def test_row_longer_than_L_guard():
    mod = packer.get_mod()
    if mod is None:
        pytest.skip("native packer unavailable")
    out = np.empty((1, 4), np.uint8)
    lens = np.empty(1, np.int32)
    with pytest.raises(ValueError):
        mod.pack_into(["acgtacgt"], out.ctypes.data, 4, 0, lens.ctypes.data)
