"""Batched glocal-DP screening on device (XLA path).

The genome search is screen-then-traceback (SURVEY.md §7.3): hits are
sparse, so the device computes — exactly, in int32 — the final DP row
(best score per alignment *end* column) for a batch of windows, and only
windows with a qualifying end column are handed to the host engine for
traceback + PAM extension.  False positives are impossible by
construction (same integer recurrence as the oracle); so are false
negatives.

Recurrence (matches calitas_tpu.align.oracle.dp_matrix):

    S[0, j] = 0
    S[i, 0] = i * target_gap
    S[i, j] = max(S[i-1, j-1] + pair, S[i-1, j] + tgap, S[i, j-1] + qgap)

Layout: we scan target columns (length T) and keep the full DP *column*
[B, Q+1] as carry.  The in-column "up" chain is a max-plus prefix scan,
computed as ``cummax(tmp - i*tgap) + i*tgap`` along the (tiny) Q axis.
All lanes of the [B, Q+1] tile do useful work; batch B provides the
parallelism.

This module is deliberately pure-XLA (runs on CPU/TPU identically); the
Pallas kernel in ``dp_pallas2`` is a drop-in replacement for the same
contract.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from calitas_tpu import _enable_jax_compilation_cache

_enable_jax_compilation_cache()
from calitas_tpu.core.scoring import Scorer


@partial(jax.jit, static_argnames=("match", "mismatch", "qgap", "tgap"))
def _screen_scores(qmask, tmasks, lengths, match, mismatch, qgap, tgap):
    """Best final-row score over valid end columns, per batch row.

    qmask:   [Q]    uint8 query IUPAC masks (uppercase guide)
    tmasks:  [B, T] uint8 target masks (N and padding -> 0)
    lengths: [B]    int32 valid window lengths (end columns > length ignored)
    returns: [B]    int32 max_{1<=j<=len} S[Q, j]
    """
    B, T = tmasks.shape
    Q = qmask.shape[0]
    qm = qmask.astype(jnp.uint8)
    idec = jnp.arange(Q + 1, dtype=jnp.int32) * tgap  # [Q+1]

    init_col = jnp.broadcast_to(idec, (B, Q + 1))  # S[:, i, 0] = i * tgap
    neg_inf = jnp.int32(-(2**30))

    def step(carry, xs):
        s_prev, best = carry
        tcol, j = xs  # tcol: [B] uint8, j: scalar int32 (1-based column)
        compat = (qm[None, :] & tcol[:, None]) != 0  # [B, Q]
        pair = jnp.where(compat, jnp.int32(match), jnp.int32(mismatch))
        diag = s_prev[:, :-1] + pair
        left = s_prev[:, 1:] + jnp.int32(qgap)
        tmp = jnp.maximum(diag, left)  # rows 1..Q
        tmp_full = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), tmp], axis=1
        )  # row 0 = 0 (free start)
        new = jax.lax.cummax(tmp_full - idec[None, :], axis=1) + idec[None, :]
        end_score = jnp.where(j <= lengths, new[:, Q], neg_inf)
        best = jnp.maximum(best, end_score)
        return (new, best), None

    xs = (tmasks.T, jnp.arange(1, T + 1, dtype=jnp.int32))
    (_, best), _ = jax.lax.scan(
        step, (init_col, jnp.full((B,), neg_inf, jnp.int32)), xs
    )
    return best


@partial(jax.jit, static_argnames=("match", "mismatch", "qgap", "tgap"))
def _screen_scores_ranges(
    qmask, tmasks, lengths, min_score, match, mismatch, qgap, tgap
):
    """Like :func:`_screen_scores` but also returns the (min, max) 1-based
    end columns whose final-row score reaches ``min_score`` (min = T+1 /
    max = 0 when none) — the device side of the sliced host finish."""
    B, T = tmasks.shape
    Q = qmask.shape[0]
    qm = qmask.astype(jnp.uint8)
    idec = jnp.arange(Q + 1, dtype=jnp.int32) * tgap
    init_col = jnp.broadcast_to(idec, (B, Q + 1))
    neg_inf = jnp.int32(-(2**30))
    ms = jnp.asarray(min_score, jnp.int32)

    def step(carry, xs):
        s_prev, best, mn, mx = carry
        tcol, j = xs
        compat = (qm[None, :] & tcol[:, None]) != 0
        pair = jnp.where(compat, jnp.int32(match), jnp.int32(mismatch))
        tmp = jnp.maximum(s_prev[:, :-1] + pair, s_prev[:, 1:] + jnp.int32(qgap))
        tmp_full = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), tmp], axis=1)
        new = jax.lax.cummax(tmp_full - idec[None, :], axis=1) + idec[None, :]
        end_score = jnp.where(j <= lengths, new[:, Q], neg_inf)
        best = jnp.maximum(best, end_score)
        qual = end_score >= ms
        mn = jnp.where(qual, jnp.minimum(mn, j), mn)
        mx = jnp.where(qual, j, mx)
        return (new, best, mn, mx), None

    xs = (tmasks.T, jnp.arange(1, T + 1, dtype=jnp.int32))
    (_, best, mn, mx), _ = jax.lax.scan(
        step,
        (
            init_col,
            jnp.full((B,), neg_inf, jnp.int32),
            jnp.full((B,), T + 1, jnp.int32),
            jnp.zeros((B,), jnp.int32),
        ),
        xs,
    )
    return best, mn, mx


@partial(jax.jit, static_argnames=("match", "mismatch", "qgap", "tgap"))
def _final_rows(qmask, tmasks, match, mismatch, qgap, tgap):
    """Full final DP row per batch element: [B, T] with entry j-1 = S[Q, j].
    (Used by tests and by the hit-extraction path.)"""
    B, T = tmasks.shape
    Q = qmask.shape[0]
    qm = qmask.astype(jnp.uint8)
    idec = jnp.arange(Q + 1, dtype=jnp.int32) * tgap
    init_col = jnp.broadcast_to(idec, (B, Q + 1))

    def step(s_prev, tcol):
        compat = (qm[None, :] & tcol[:, None]) != 0
        pair = jnp.where(compat, jnp.int32(match), jnp.int32(mismatch))
        tmp = jnp.maximum(s_prev[:, :-1] + pair, s_prev[:, 1:] + jnp.int32(qgap))
        tmp_full = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), tmp], axis=1)
        new = jax.lax.cummax(tmp_full - idec[None, :], axis=1) + idec[None, :]
        return new, new[:, Q]

    _, rows = jax.lax.scan(step, init_col, tmasks.T)
    return rows.T  # [B, T]


class ScreenKernel:
    """Callable wrapper binding a scorer; dispatches to the XLA screen."""

    def __init__(self, scorer: Scorer):
        self.scorer = scorer

    def prepare_targets(self, tmasks: np.ndarray, lengths: np.ndarray):
        """Upload a target batch once; the handle serves every query
        (multi-guide screens share one H2D per batch)."""
        return (jnp.asarray(tmasks), jnp.asarray(lengths, dtype=jnp.int32))

    def max_scores_prepared_async(self, qmask: np.ndarray, prepared):
        """Dispatch the screen on a prepared batch and return a zero-arg
        resolver: the device computes while the host prepares the next
        batch (the variant pass double-buffers through this)."""
        tm, ln = prepared
        s = self.scorer
        out = _screen_scores(
            jnp.asarray(qmask), tm, ln,
            match=s.match_score,
            mismatch=s.mismatch_score,
            qgap=s.query_gap_score,
            tgap=s.target_gap_score,
        )
        return lambda: np.asarray(out)

    def max_scores_async(
        self, qmask: np.ndarray, tmasks: np.ndarray, lengths: np.ndarray
    ):
        return self.max_scores_prepared_async(
            qmask, self.prepare_targets(tmasks, lengths)
        )

    def max_scores(
        self, qmask: np.ndarray, tmasks: np.ndarray, lengths: np.ndarray
    ) -> np.ndarray:
        return self.max_scores_async(qmask, tmasks, lengths)()

    def final_rows(self, qmask: np.ndarray, tmasks: np.ndarray) -> np.ndarray:
        s = self.scorer
        return np.asarray(
            _final_rows(
                jnp.asarray(qmask),
                jnp.asarray(tmasks),
                match=s.match_score,
                mismatch=s.mismatch_score,
                qgap=s.query_gap_score,
                tgap=s.target_gap_score,
            )
        )
