"""Sequence-parallel wavefront: one (giant) pair's DP lanes sharded across
the device mesh, with per-diagonal halo exchange over ICI.

This is the context-parallel analog from SURVEY §2.4/§5: the anti-diagonal
state vectors (H, E, F over b-positions) are split across an axis of the
mesh; each diagonal step every device computes its lane slice and sends its
LAST lane to the right neighbor via ``jax.lax.ppermute`` — the one-lane halo
the y-1 shift needs.  Row-0 boundary values are injected on the device that
owns lane 0; the NW corner is recovered with a cross-device ``pmax``.

Scores-only, default flags (the H/E/F reduction of alignment.c:89-167 — see
ops/pallas_dp.py for its exactness argument).  Complements the pair-batch
data parallelism in ``engine.py``: use THIS when single pairs are too long
for one chip's memory/compute, use pair-batch sharding for throughput.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.dp import _profile, _shear, compact_inputs, pad_batch
from ..ops.pallas_dp import POISON
from ..scoring.config import ScoringConfig

try:
    from jax import shard_map  # type: ignore  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _local_fill(ss, na, nb, go, ge, mn, *, axis, LBshard, D, is_sw):
    """Per-device body under shard_map: lanes = this device's slice of the
    global y-1 axis; halo = one lane to the right neighbor per diagonal."""
    i32 = jnp.int32
    nd = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    B = ss.shape[1]
    gop = go + ge

    # global y0 coordinate of each local lane
    y0 = jax.lax.broadcasted_iota(i32, (B, LBshard), 1) + idx * LBshard
    lane0 = y0 == 0

    def halo_shift(v, fillv):
        """sh over the GLOBAL lane axis: receive the left neighbor's last
        lane over ICI, then shift locally; the global lane 0 gets fillv."""
        edge = v[:, -1:]
        recv = jax.lax.ppermute(
            edge, axis, [(i, (i + 1) % nd) for i in range(nd)]
        )
        s = jnp.concatenate([recv, v[:, :-1]], axis=1)
        return jnp.where(lane0, fillv, s)

    # derive from the sharded input so scan carries are mesh-varying
    zero = jnp.zeros_like(ss[0])
    mnv = zero + mn

    if is_sw:
        h = e = f = hs = es = hs2 = zero
        run = lambda d: jnp.int32(0)
    else:
        run = lambda d: go + d * ge
        h = jnp.where(lane0, gop, mn)  # diag 1: cell (1, 0)
        f = mnv
        sh1 = jnp.where(y0 == 1, gop, mn)
        hs = jnp.where(lane0, gop, sh1)
        es = jnp.where(lane0, mn, sh1)
        hs2 = jnp.where(lane0, 0, mn)

    INT_MIN = jnp.int32(np.iinfo(np.int32).min)
    accv = zero + (0 if is_sw else INT_MIN)
    lane_nb = y0 == (nb[:, None] - 1)

    def step(carry, xs):
        h, hs, es, f, hs2, accv = carry
        d, ss_row = xs
        e_new = jnp.maximum(jnp.maximum(hs + gop, es + ge), mn)
        f_new = jnp.maximum(jnp.maximum(h + gop, f + ge), mn)
        m_arg = hs2 + ss_row
        h_new = jnp.maximum(m_arg, jnp.maximum(e_new, f_new))

        # x == 0 column at global lane d-1
        at0 = y0 == (d - 1)
        rv = run(d)
        h_new = jnp.where(at0, rv, h_new)
        e_new = jnp.where(at0, rv, e_new)
        f_new = jnp.where(at0, 0 if is_sw else mn, f_new)

        if is_sw:
            accv = jnp.maximum(accv, jnp.maximum(m_arg, 0))
        else:
            hit = ((na + nb) == d)[:, None]
            accv = jnp.where(lane_nb & hit, h_new, accv)

        sh_h = halo_shift(h_new, rv)
        sh_e = halo_shift(e_new, 0 if is_sw else mn)
        return (h_new, sh_h, sh_e, f_new, hs, accv), None

    dvec = jnp.arange(2, D + 2, dtype=i32)
    carry, _ = jax.lax.scan(step, (h, hs, es, f, hs2, accv), (dvec, ss))
    accv = carry[5]
    local_best = jnp.max(accv, axis=1)  # (B,)
    return jax.lax.pmax(local_best, axis)


def sp_scores(sc: ScoringConfig, seqs_a, seqs_b, mesh: Mesh,
              axis: str = "seq", *, is_sw: bool = False) -> np.ndarray:
    """Optimal scores with the DP lane axis sharded over ``mesh[axis]``.
    Default-flags configs with gap_open <= 0 (like the Pallas fast path)."""
    assert sc.gap_open <= 0 and not (
        sc.no_start_gap_penalty or sc.no_end_gap_penalty or sc.no_gaps_in_a
        or sc.no_gaps_in_b or sc.no_mismatches
    )
    nd = mesh.shape[axis]
    a, na = pad_batch(seqs_a)
    b, nb = pad_batch(seqs_b)
    LB = -(-b.shape[1] // nd) * nd
    b = np.pad(b, ((0, 0), (0, LB - b.shape[1])))
    ac, bc, subK, imK = compact_inputs(sc, a, b)
    del imK
    LA = ac.shape[1]
    D = LA + LB  # diagonals 2..LA+LB+1 padded by one for the shear slice
    go = np.int32(sc.gap_open)
    ge = np.int32(sc.gap_extend)
    mn = np.int32(sc.dp_floor(is_sw))

    @jax.jit
    def prep(ac, bc, na, nb, subK):
        # poison pad positions (see ops/pallas_dp.py) so pad-region MATCH
        # values clamp <= 0 and the SW best needs no validity masks
        Ka, Kb = subK.shape
        ac = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, ac.shape, 1) < na[:, None],
            ac, Ka,
        )
        bc = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, bc.shape, 1) < nb[:, None],
            bc, Kb,
        )
        subK = jnp.pad(subK, ((0, 1), (0, 1)), constant_values=POISON)
        p = _profile(ac, bc, subK, jnp.int32)
        sh = _shear(p)[:, :, :D]  # (B, LB, D): [b, y0, r]
        return sh.transpose(2, 0, 1)  # (D, B, LB): lane axis last

    ss = prep(jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na),
              jnp.asarray(nb), jnp.asarray(subK))

    fn = shard_map(
        lambda ss, na_, nb_: _local_fill(
            ss, na_, nb_, go, ge, mn, axis=axis, LBshard=LB // nd, D=D,
            is_sw=is_sw,
        ),
        mesh=mesh,
        in_specs=(P(None, None, axis), P(), P()),
        out_specs=P(),
    )
    scores = np.asarray(jax.jit(fn)(ss, jnp.asarray(na), jnp.asarray(nb)))
    return scores
