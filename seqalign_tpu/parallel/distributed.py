"""Multi-host (DCN) execution: ``jax.distributed`` wiring, per-host input
shards, and result re-assembly.

The reference is single-process/single-thread (SURVEY §2.4) — multi-host
scale-out is new capability, built the TPU way: pairwise alignment is
embarrassingly parallel over pairs, so each host reads a round-robin shard
of the input pairs (``io.seqio.read_pairs_sharded``), fills them on its own
local devices, and only the O(B) result vector is exchanged with a
process-level allgather.  No collective ever crosses DCN inside the DP fill
itself; ICI-scale sharding of one batch lives in ``parallel.engine`` and
sequence-parallel fills of one giant pair in ``parallel.wavefront_sp``.

Entry points:

* ``init_from_env()`` — call once per process before any other JAX use.
  Reads ``SEQALIGN_COORDINATOR`` (host:port), ``SEQALIGN_NUM_PROCS``,
  ``SEQALIGN_PROC_ID`` (or explicit kwargs) and brings up
  ``jax.distributed``; a no-op returning False when unset (single process).
* ``distributed_score_file()`` — every host computes scores for its pair
  shard; returns the complete, pair-ordered score vector on every host.

Validated by a real 2-process CPU integration test
(tests/test_distributed.py) — the same code path a multi-host TPU pod
slice runs, minus the accelerator.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..io import seqio
from ..scoring.config import ScoringConfig


def init_from_env(coordinator: Optional[str] = None,
                  num_processes: Optional[int] = None,
                  process_id: Optional[int] = None,
                  local_device_ids=None) -> bool:
    """Initialize the JAX distributed runtime from args or environment.

    Returns True when multi-process mode was brought up, False when no
    coordinator is configured (single-process mode).  Must run before the
    first jax.devices() / computation in the process.
    """
    coordinator = coordinator or os.environ.get("SEQALIGN_COORDINATOR")
    if not coordinator:
        return False
    if num_processes is None:
        num_processes = int(os.environ["SEQALIGN_NUM_PROCS"])
    if process_id is None:
        process_id = int(os.environ["SEQALIGN_PROC_ID"])
    import jax

    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return True


def _allgather_ragged(idx: np.ndarray, vals: np.ndarray):
    """Gather per-host (global_pair_index, value) shards of different
    lengths into the full pair-ordered vector, identical on every host."""
    import jax
    from jax.experimental import multihost_utils

    n_local = np.array([len(idx)], np.int32)
    counts = np.asarray(multihost_utils.process_allgather(n_local)).ravel()
    width = int(counts.max(initial=0))
    pid = jax.process_index()
    idx_pad = np.full(width, -1, np.int64)
    idx_pad[: len(idx)] = idx
    val_pad = np.zeros(width, vals.dtype if len(vals) else np.int32)
    val_pad[: len(vals)] = vals
    g_idx = np.asarray(multihost_utils.process_allgather(idx_pad))
    g_val = np.asarray(multihost_utils.process_allgather(val_pad))
    del pid
    total = int(counts.sum())
    out = np.zeros(total, g_val.dtype)
    flat_idx = g_idx.ravel()
    keep = flat_idx >= 0
    out[flat_idx[keep]] = g_val.ravel()[keep]
    return out


def distributed_score_file(sc: ScoringConfig, path1: str,
                           path2: Optional[str] = None, *, is_sw: bool,
                           batch: int = 256) -> np.ndarray:
    """Score every pair in the input file(s) across all hosts.

    Each host streams its round-robin pair shard, fills batches on its
    local devices (Pallas/XLA routing per ``aligners``), and the full
    pair-ordered score vector is assembled with a process allgather —
    every host returns the identical complete result.

    Single-process (no ``init_from_env``) degrades to a plain local run.
    """
    import jax

    from ..aligners import _scores_auto

    pid = jax.process_index()
    nproc = jax.process_count()
    idxs: list[int] = []
    scores: list[np.ndarray] = []
    buf_i: list[int] = []
    buf_a: list[str] = []
    buf_b: list[str] = []

    def flush():
        if not buf_i:
            return
        s = _scores_auto(sc, buf_a, buf_b, is_sw=is_sw)
        idxs.extend(buf_i)
        scores.append(np.asarray(s))
        buf_i.clear()
        buf_a.clear()
        buf_b.clear()

    for idx, (_, seq_a), (_, seq_b) in seqio.read_pairs_sharded(
        path1, path2, pid, nproc
    ):
        buf_i.append(idx)
        buf_a.append(seq_a)
        buf_b.append(seq_b)
        if len(buf_i) >= batch:
            flush()
    flush()
    local_idx = np.asarray(idxs, np.int64)
    local_scores = (
        np.concatenate(scores) if scores else np.zeros(0, np.int32)
    )
    if nproc == 1:
        out = np.zeros(len(local_idx), local_scores.dtype)
        out[local_idx] = local_scores
        return out
    return _allgather_ragged(local_idx, local_scores)
