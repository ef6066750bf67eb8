"""Pallas scores kernel (interpret mode on CPU) must match the XLA wavefront
path — which is itself golden-verified against the reference — exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from seqalign_tpu.ops import dp
from seqalign_tpu.ops.pallas_dp import pallas_scores
from seqalign_tpu.scoring.presets import (
    scoring_system_default,
    scoring_system_sw_default,
)


def _setup(sc, B, LA, LB, seed, is_sw):
    rng = np.random.default_rng(seed)
    lut = np.frombuffer(b"acgt", dtype=np.uint8)
    a = lut[rng.integers(0, 4, (B, LA))]
    b = lut[rng.integers(0, 4, (B, LB))]
    na = rng.integers(1, LA + 1, B).astype(np.int32)
    nb = rng.integers(1, LB + 1, B).astype(np.int32)
    ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
    go, ge = np.int32(sc.gap_open), np.int32(sc.gap_extend)
    mn = np.int32(sc.dp_floor(is_sw))
    args = tuple(
        jnp.asarray(v) for v in (ac, bc, na, nb, subK, imK)
    ) + (go, ge, mn)
    return args


@pytest.mark.parametrize("unroll", [8, 3])
@pytest.mark.parametrize("is_sw", [False, True])
@pytest.mark.parametrize("B,LA,LB", [(8, 96, 128), (16, 128, 128), (8, 40, 128)])
def test_pallas_scores_match_xla(is_sw, B, LA, LB, unroll):
    sc = scoring_system_sw_default() if is_sw else scoring_system_default()
    args = _setup(sc, B, LA, LB, seed=B + LA + is_sw, is_sw=is_sw)
    got = np.asarray(
        pallas_scores(*args, is_sw=is_sw, interpret=True, unroll=unroll)
    )
    ref = dp.dp_fill(
        *args, is_sw=is_sw, nsg=False, neg=False, nga=False, ngb=False,
        nmm=False, emit_dirs=False, emit_m=False, emit_gab=False,
    )
    want = np.asarray(ref.best if is_sw else jnp.max(ref.corner, axis=1))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("use_f32,ss8", [(False, False), (False, True),
                                         (True, False), (True, True)])
@pytest.mark.parametrize("is_sw", [False, True])
def test_pallas_dtype_modes_match_xla(is_sw, use_f32, ss8):
    """The f32 DP mode (exact < 2**24 with a -inf NW sentinel) and the int8
    substitution-plane mode must be bit-identical to the int32 kernel."""
    sc = scoring_system_sw_default() if is_sw else scoring_system_default()
    args = _setup(sc, 8, 96, 128, seed=3 + is_sw, is_sw=is_sw)
    got = np.asarray(
        pallas_scores(*args, is_sw=is_sw, interpret=True, use_f32=use_f32,
                      ss8=ss8)
    )
    ref = dp.dp_fill(
        *args, is_sw=is_sw, nsg=False, neg=False, nga=False, ngb=False,
        nmm=False, emit_dirs=False, emit_m=False, emit_gab=False,
    )
    want = np.asarray(ref.best if is_sw else jnp.max(ref.corner, axis=1))
    np.testing.assert_array_equal(got, want)
