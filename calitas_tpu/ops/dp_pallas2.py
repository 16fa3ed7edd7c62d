"""Pallas TPU kernel v2: register-resident column scan.

Layout: each grid cell owns a block of 1024 windows arranged as one
[8, 128] int32 vreg per DP row.  The DP column state is Q+1 vregs carried
through a fori_loop over target columns; the in-column chain is a fully
unrolled Python loop over the (static) query length — no sublane rolls,
no scans, every op is a dense [8, 128] op where all 1024 lanes are
distinct windows doing useful cells.

Per column per row i (query base q_i):
    diag_in   = S_prev[i-1]          (saved before overwrite)
    pair      = (q_i & tcol) != 0 ? match : mismatch
    new[i]    = max(diag_in + pair, S_prev[i] + qgap, new[i-1] + tgap)

Targets are passed as [T, 8, 128] int32 so each column load is an aligned
full-tile read.

Exact int32; bit-identical to the oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from calitas_tpu import _enable_jax_compilation_cache

_enable_jax_compilation_cache()
from calitas_tpu.core.scoring import Scorer

LANES = 128
SUBLANES = 8
BLOCK_W = SUBLANES * LANES  # 1024 windows per grid cell
NEG_INF = -(2**30)


def _kernel(
    qvals_ref,  # [1, Q_pad] int32 in SMEM: query masks
    tcols_ref,  # [T, SUBLANES, LANES] int32 target masks for this block
    lengths_ref,  # [SUBLANES, LANES] int32
    best_ref,  # [SUBLANES, LANES] int32 out
    *,
    T: int,
    Q: int,
    match: int,
    mismatch: int,
    qgap: int,
    tgap: int,
):
    lens = lengths_ref[:, :]
    zeros = jnp.zeros((SUBLANES, LANES), jnp.int32)

    # S[i] = i * tgap at column 0
    init_state = tuple(
        jnp.full((SUBLANES, LANES), i * tgap, jnp.int32) for i in range(Q + 1)
    )
    best0 = jnp.full((SUBLANES, LANES), NEG_INF, jnp.int32)

    m = jnp.int32(match)
    mm = jnp.int32(mismatch)
    qg = jnp.int32(qgap)
    tg = jnp.int32(tgap)

    def body(j, carry):
        state, best = carry
        tcol = tcols_ref[j]  # [SUBLANES, LANES]
        new = [zeros]  # row 0: free start
        diag_in = state[0]
        for i in range(1, Q + 1):
            qi = qvals_ref[0, i - 1]
            pair = jnp.where((tcol & qi) != 0, m, mm)
            cand = jnp.maximum(diag_in + pair, state[i] + qg)
            cand = jnp.maximum(cand, new[i - 1] + tg)
            diag_in = state[i]
            new.append(cand)
        ok = (j + 1) <= lens
        best = jnp.maximum(best, jnp.where(ok, new[Q], NEG_INF))
        return tuple(new), best

    _, best = jax.lax.fori_loop(0, T, body, (init_state, best0))
    best_ref[:, :] = best


@partial(
    jax.jit,
    static_argnames=("Q", "match", "mismatch", "qgap", "tgap", "interpret"),
)
def _pallas_screen2(
    qvals, tcols, lengths, *, Q, match, mismatch, qgap, tgap, interpret=False
):
    T = tcols.shape[0]
    n_blocks = tcols.shape[1] // SUBLANES
    kernel = partial(
        _kernel, T=T, Q=Q, match=match, mismatch=mismatch, qgap=qgap, tgap=tgap
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (T, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * SUBLANES, LANES), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * T * Q * n_blocks * BLOCK_W,
            bytes_accessed=T * n_blocks * BLOCK_W * 4,
            transcendentals=0,
        ),
    )(qvals, tcols, lengths)
    return out


class PallasScreenKernelV2:
    """Drop-in ScreenKernel using the register-column-scan kernel."""

    def __init__(self, scorer: Scorer, interpret: bool = False):
        self.scorer = scorer
        self.interpret = interpret

    @staticmethod
    def supports(q_len: int) -> bool:
        return q_len <= 48  # unroll budget

    def prepare_targets(self, tmasks: np.ndarray, lengths: np.ndarray):
        """Pad, lay out and upload a target batch once; the handle
        serves every query (multi-guide screens share one H2D and one
        kernel layout per batch)."""
        B, T = tmasks.shape
        pad_b = (-B) % BLOCK_W
        if pad_b:
            tmasks = np.concatenate(
                [tmasks, np.zeros((pad_b, T), tmasks.dtype)], axis=0
            )
            lengths = np.concatenate([lengths, np.zeros(pad_b, lengths.dtype)])
        Bp = B + pad_b

        # [B, T] -> [T, Bp/128, 128] -> grid blocks of [T, 8, 128]
        tcols = tmasks.T.astype(np.int32).reshape(T, Bp // LANES, LANES)
        lengths2 = lengths.astype(np.int32).reshape(Bp // LANES, LANES)
        return (jnp.asarray(tcols), jnp.asarray(lengths2), B)

    def max_scores_prepared_async(self, qmask: np.ndarray, prepared):
        """Dispatch the screen on a prepared batch and return a zero-arg
        resolver (see ScreenKernel.max_scores_prepared_async)."""
        tcols, lengths2, B = prepared
        Q = len(qmask)
        qvals = np.zeros((1, max(Q, 1)), dtype=np.int32)
        qvals[0, :Q] = qmask

        s = self.scorer
        out = _pallas_screen2(
            jnp.asarray(qvals), tcols, lengths2,
            Q=Q,
            match=s.match_score,
            mismatch=s.mismatch_score,
            qgap=s.query_gap_score,
            tgap=s.target_gap_score,
            interpret=self.interpret,
        )
        return lambda: np.asarray(out).reshape(-1)[:B]

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


# ---------------------------------------------------------------------------
# Dual-query fused kernel: both search strands in one pass over the block
# ---------------------------------------------------------------------------

#: gate sentinel for PAM-less starts; far below any reachable DP value but
#: far above int32 overflow when path costs accumulate
NEG_GATE = -(2**26)


def pack_tcols_jax(wins):
    """[bw, T] uint8 annotated window bytes -> [ceil(T/4), bw//LANES,
    LANES] int32 words, four consecutive DP columns per word
    (little-endian: byte b = column 4w+b).

    This is the packed tcols layout of the dual/multi kernels: the
    device-side relayout (transpose + dtype widen) moves 1 byte per DP
    cell column instead of 4 — the pre-kernel [bw, T] -> [T, ...] int32
    relayout was write-bandwidth-bound at ~1.5x the DP kernel itself.
    The kernels unpack bytes in-register (2 VPU ops per column against
    ~6*Q for the DP itself)."""
    bw, T = wins.shape
    W4 = -(-T // 4)
    # Pad the word axis to a sublane multiple: the [bw, W4] -> [W4, bw]
    # transpose then moves whole (8, 128) tiles on both sides instead of
    # a ragged edge.  The kernels loop exactly ceil(T/4) words, so the
    # dead rows are never read.
    W4p = -(-W4 // SUBLANES) * SUBLANES
    if T != W4p * 4:
        wins = jnp.pad(wins, ((0, 0), (0, W4p * 4 - T)))
    w = wins.reshape(bw, W4p, 4).astype(jnp.int32)
    words = w[..., 0] | (w[..., 1] << 8) | (w[..., 2] << 16) | (w[..., 3] << 24)
    return words.T.reshape(W4p, bw // LANES, LANES)


def _kernel2(
    qvals_ref,  # [2, Q] int32 in SMEM: fw and rc query masks
    minscore_ref,  # [1] int32 in SMEM: qualifying-end threshold
    tcols_ref,  # packed: [ceil(T/4), SUBLANES, LANES] int32, four annotated
    #             bytes per word (byte b = column 4w+b); unpacked:
    #             [T, SUBLANES, LANES] int32, one column per row.
    #             Per byte/column: low 4 bits = target mask; bit 4 = PAM-ok
    #             for a chain-A alignment END at this column; bit 5 =
    #             PAM-ok for a chain-B alignment START after it
    best_ref,  # [SUBLANES, LANES] int32 out: max over both queries
    ranges_ref=None,  # [2, 2, SUBLANES, LANES] int32 out (emit_ranges only):
    #             per chain (min, max) 1-based qualifying end column
    *,
    T: int,
    Q: int,
    match: int,
    mismatch: int,
    qgap: int,
    tgap: int,
    pam_gate: bool,
    emit_ranges: bool,
    packed: bool,
):
    zeros = jnp.zeros((SUBLANES, LANES), jnp.int32)
    init = tuple(
        jnp.full((SUBLANES, LANES), i * tgap, jnp.int32) for i in range(Q + 1)
    )
    best0 = jnp.full((SUBLANES, LANES), NEG_INF, jnp.int32)
    m = jnp.int32(match)
    mm = jnp.int32(mismatch)
    qg = jnp.int32(qgap)
    tg = jnp.int32(tgap)
    ms = minscore_ref[0]

    def chain(state, tcol, q, row0):
        new = [row0]
        diag_in = state[0]
        for i in range(1, Q + 1):
            qi = qvals_ref[q, i - 1]
            pair = jnp.where((tcol & qi) != 0, m, mm)
            cand = jnp.maximum(diag_in + pair, state[i] + qg)
            cand = jnp.maximum(cand, new[i - 1] + tg)
            diag_in = state[i]
            new.append(cand)
        return tuple(new)

    def col_step(jj, tcol_raw, valid, carry):
        """One DP column: ``jj`` the 1-based column index (traced),
        ``tcol_raw`` the annotated column bytes as int32, ``valid`` a
        traced scalar bool gating end contributions (None = statically
        valid; only the tail bytes of a packed last word can be
        invalid — their state updates are harmless because no valid
        column follows them)."""
        s_fw, s_rc, best_fw, best_rc, rng = carry
        tcol = tcol_raw & 15
        if pam_gate:
            # chain A (DP-orientation query): its PAM sits to the right of
            # the alignment, so only PAM-ok END columns may contribute.
            end_ok = (tcol_raw & 16) != 0
            # chain B (revcomp query): its PAM precedes the alignment, so
            # gate the glocal free start instead.
            start_ok = (tcol_raw & 32) != 0
            row0_rc = jnp.where(start_ok, 0, NEG_GATE)
        else:
            end_ok = None
            row0_rc = zeros
        n_fw = chain(s_fw, tcol, 0, zeros)
        n_rc = chain(s_rc, tcol, 1, row0_rc)
        end_fw = (
            jnp.where(end_ok, n_fw[Q], NEG_INF) if pam_gate else n_fw[Q]
        )
        end_rc = n_rc[Q]
        if valid is not None:
            end_fw = jnp.where(valid, end_fw, NEG_INF)
            end_rc = jnp.where(valid, end_rc, NEG_INF)
        best_fw = jnp.maximum(best_fw, end_fw)
        best_rc = jnp.maximum(best_rc, end_rc)
        if emit_ranges:
            mn_fw, mx_fw, mn_rc, mx_rc = rng
            q_fw = end_fw >= ms
            q_rc = end_rc >= ms
            mn_fw = jnp.where(q_fw, jnp.minimum(mn_fw, jj), mn_fw)
            mx_fw = jnp.where(q_fw, jj, mx_fw)
            mn_rc = jnp.where(q_rc, jnp.minimum(mn_rc, jj), mn_rc)
            mx_rc = jnp.where(q_rc, jj, mx_rc)
            rng = (mn_fw, mx_fw, mn_rc, mx_rc)
        return n_fw, n_rc, best_fw, best_rc, rng

    rng0 = (
        (jnp.full((SUBLANES, LANES), T + 1, jnp.int32), zeros,
         jnp.full((SUBLANES, LANES), T + 1, jnp.int32), zeros)
        if emit_ranges
        else ()
    )
    carry0 = (init, init, best0, best0, rng0)
    if packed:
        W4 = -(-T // 4)

        def body(w, carry):
            word = tcols_ref[w]
            for b in range(4):
                tcol_raw = (word >> (8 * b)) & 0xFF if b else word & 0xFF
                if T % 4 == 0 or b < T % 4:
                    valid = None  # statically in range for every word
                else:
                    valid = (4 * w + b) < T  # tail bytes of the last word
                carry = col_step(4 * w + b + 1, tcol_raw, valid, carry)
            return carry

        carry = jax.lax.fori_loop(0, W4, body, carry0)
    else:
        # all columns are valid (the caller always packs full windows)
        carry = jax.lax.fori_loop(
            0, T,
            lambda j, c: col_step(
                j + 1, tcols_ref[j].astype(jnp.int32), None, c
            ),
            carry0,
        )
    _, _, best_fw, best_rc, rng = carry
    best_ref[0, :, :] = best_fw
    best_ref[1, :, :] = best_rc
    if emit_ranges:
        ranges_ref[0, 0, :, :] = rng[0]
        ranges_ref[0, 1, :, :] = rng[1]
        ranges_ref[1, 0, :, :] = rng[2]
        ranges_ref[1, 1, :, :] = rng[3]


@partial(
    jax.jit,
    static_argnames=(
        "Q", "match", "mismatch", "qgap", "tgap", "pam_gate", "emit_ranges",
        "T", "interpret",
    ),
)
def _pallas_screen_dual(
    qvals, tcols, min_score=0, *, Q, match, mismatch, qgap, tgap,
    pam_gate=False, emit_ranges=False, T=None, interpret=False,
):
    """Fused both-strand screen: returns [2, n_blocks*8, 128] int32 —
    per-chain (fw, rc) best scores per window.  All windows full length.
    With ``emit_ranges`` also returns [2, 2, n_blocks*8, 128] int32
    per-chain (min, max) 1-based end columns scoring >= min_score (min is
    T+1 / max is 0 when no column qualifies).

    ``tcols`` is either the packed word layout of :func:`pack_tcols_jax`
    (pass the true column count ``T``; the default production layout —
    4x less relayout traffic) or the legacy one-int32-per-column layout
    (leave ``T`` None; kept as the in-process A/B baseline)."""
    packed = T is not None
    if not packed:
        T = tcols.shape[0]
    n_blocks = tcols.shape[1] // SUBLANES
    kernel = partial(
        _kernel2, T=T, Q=Q, match=match, mismatch=mismatch, qgap=qgap,
        tgap=tgap, pam_gate=pam_gate, emit_ranges=emit_ranges, packed=packed,
    )
    out_specs = [
        pl.BlockSpec(
            (2, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((2, n_blocks * SUBLANES, LANES), jnp.int32),
    ]
    if emit_ranges:
        out_specs.append(
            pl.BlockSpec(
                (2, 2, SUBLANES, LANES), lambda i: (0, 0, i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((2, 2, n_blocks * SUBLANES, LANES), jnp.int32)
        )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (tcols.shape[0], SUBLANES, LANES), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=16 * T * Q * n_blocks * BLOCK_W,
            bytes_accessed=tcols.shape[0] * n_blocks * BLOCK_W * 4,
            transcendentals=0,
        ),
    )(qvals, jnp.asarray(min_score, jnp.int32).reshape(1), tcols)
    if emit_ranges:
        return out[0], out[1]
    return out[0]


# ---------------------------------------------------------------------------
# Multi-guide fused kernel: a set of same-length guides share one pass over
# each window block (the window block stays resident in VMEM across the
# guide grid dimension, so it is fetched from HBM once per block instead of
# once per guide).  FULL single-guide contract per guide: PAM-gated end
# columns (shared tcols bits 4/5 — guides in a group share one PAM spec)
# and per-guide qualifying end-column ranges against per-guide min scores.
# ---------------------------------------------------------------------------

def _kernel_multi(
    qvals_ref,  # [G, 2, Q] int32 in SMEM: fw and rc masks per guide
    minscore_ref,  # [G] int32 in SMEM: per-guide qualifying-end thresholds
    tcols_ref,  # packed: [ceil(T/4), SUBLANES, LANES] int32 words (byte b =
    #             column 4w+b); unpacked: [T, SUBLANES, LANES] int32.
    #             Per byte/column: low 4 bits = target mask; bit 4 =
    #             PAM-ok chain-A END; bit 5 = PAM-ok chain-B START
    best_ref,  # [1, 2, SUBLANES, LANES] int32 out: per-chain maxima
    ranges_ref=None,  # [1, 2, 2, SUBLANES, LANES] int32 out (emit_ranges):
    #             per chain (min, max) 1-based qualifying end column
    *,
    T: int,
    Q: int,
    match: int,
    mismatch: int,
    qgap: int,
    tgap: int,
    pam_gate: bool,
    emit_ranges: bool,
    packed: bool,
):
    g = pl.program_id(1)
    zeros = jnp.zeros((SUBLANES, LANES), jnp.int32)
    init = tuple(
        jnp.full((SUBLANES, LANES), i * tgap, jnp.int32) for i in range(Q + 1)
    )
    best0 = jnp.full((SUBLANES, LANES), NEG_INF, jnp.int32)
    m = jnp.int32(match)
    mm = jnp.int32(mismatch)
    qg = jnp.int32(qgap)
    tg = jnp.int32(tgap)
    ms = minscore_ref[g]

    def chain(state, tcol, q, row0):
        new = [row0]
        diag_in = state[0]
        for i in range(1, Q + 1):
            qi = qvals_ref[g, q, i - 1]
            pair = jnp.where((tcol & qi) != 0, m, mm)
            cand = jnp.maximum(diag_in + pair, state[i] + qg)
            cand = jnp.maximum(cand, new[i - 1] + tg)
            diag_in = state[i]
            new.append(cand)
        return tuple(new)

    def col_step(jj, tcol_raw, valid, carry):
        s_fw, s_rc, best_fw, best_rc, rng = carry
        tcol = tcol_raw & 15
        if pam_gate:
            # Same gate semantics as the single-guide dual kernel
            # (_kernel2): chain A's PAM follows the alignment (gate END
            # columns), chain B's precedes it (gate the free start).
            end_ok = (tcol_raw & 16) != 0
            start_ok = (tcol_raw & 32) != 0
            row0_rc = jnp.where(start_ok, 0, NEG_GATE)
        else:
            end_ok = None
            row0_rc = zeros
        n_fw = chain(s_fw, tcol, 0, zeros)
        n_rc = chain(s_rc, tcol, 1, row0_rc)
        end_fw = (
            jnp.where(end_ok, n_fw[Q], NEG_INF) if pam_gate else n_fw[Q]
        )
        end_rc = n_rc[Q]
        if valid is not None:
            end_fw = jnp.where(valid, end_fw, NEG_INF)
            end_rc = jnp.where(valid, end_rc, NEG_INF)
        best_fw = jnp.maximum(best_fw, end_fw)
        best_rc = jnp.maximum(best_rc, end_rc)
        if emit_ranges:
            mn_fw, mx_fw, mn_rc, mx_rc = rng
            q_fw = end_fw >= ms
            q_rc = end_rc >= ms
            mn_fw = jnp.where(q_fw, jnp.minimum(mn_fw, jj), mn_fw)
            mx_fw = jnp.where(q_fw, jj, mx_fw)
            mn_rc = jnp.where(q_rc, jnp.minimum(mn_rc, jj), mn_rc)
            mx_rc = jnp.where(q_rc, jj, mx_rc)
            rng = (mn_fw, mx_fw, mn_rc, mx_rc)
        return n_fw, n_rc, best_fw, best_rc, rng

    rng0 = (
        (jnp.full((SUBLANES, LANES), T + 1, jnp.int32), zeros,
         jnp.full((SUBLANES, LANES), T + 1, jnp.int32), zeros)
        if emit_ranges
        else ()
    )
    carry0 = (init, init, best0, best0, rng0)
    if packed:
        W4 = -(-T // 4)

        def body(w, carry):
            word = tcols_ref[w]
            for b in range(4):
                tcol_raw = (word >> (8 * b)) & 0xFF if b else word & 0xFF
                if T % 4 == 0 or b < T % 4:
                    valid = None
                else:
                    valid = (4 * w + b) < T
                carry = col_step(4 * w + b + 1, tcol_raw, valid, carry)
            return carry

        carry = jax.lax.fori_loop(0, W4, body, carry0)
    else:
        carry = jax.lax.fori_loop(
            0, T,
            lambda j, c: col_step(
                j + 1, tcols_ref[j].astype(jnp.int32), None, c
            ),
            carry0,
        )
    _, _, best_fw, best_rc, rng = carry
    # Per-chain maxima let the host skip the strand pass whose chain is
    # below threshold (same contract as the single-guide dual kernel).
    best_ref[0, 0, :, :] = best_fw
    best_ref[0, 1, :, :] = best_rc
    if emit_ranges:
        ranges_ref[0, 0, 0, :, :] = rng[0]
        ranges_ref[0, 0, 1, :, :] = rng[1]
        ranges_ref[0, 1, 0, :, :] = rng[2]
        ranges_ref[0, 1, 1, :, :] = rng[3]


@partial(
    jax.jit,
    static_argnames=(
        "Q", "match", "mismatch", "qgap", "tgap", "pam_gate", "emit_ranges",
        "T", "interpret",
    ),
)
def _pallas_screen_multi(
    qvals, tcols, min_scores=None, *, Q, match, mismatch, qgap, tgap,
    pam_gate=False, emit_ranges=False, T=None, interpret=False,
):
    """Both-strand screen for G same-length guides over one window block
    set: qvals [G, 2, Q]; returns per-chain maxima
    [G, 2, n_blocks*8, 128] int32 (chain 0 = fw query, 1 = rc query).
    With ``emit_ranges`` also returns [G, 2, 2, n_blocks*8, 128] int32
    per-guide per-chain (min, max) 1-based end columns scoring >= that
    guide's ``min_scores[g]`` (min is T+1 / max is 0 when none qualify).
    ``pam_gate`` applies the tcols bit-4/5 PAM gates exactly like the
    single-guide dual kernel (guides in the group share one PAM spec).

    ``tcols`` is either the packed word layout of :func:`pack_tcols_jax`
    (pass the true column count ``T``; the production layout) or the
    legacy one-int32-per-column layout (leave ``T`` None)."""
    packed = T is not None
    if not packed:
        T = tcols.shape[0]
    n_blocks = tcols.shape[1] // SUBLANES
    G = qvals.shape[0]
    if min_scores is None:
        min_scores = jnp.zeros((G,), jnp.int32)
    kernel = partial(
        _kernel_multi, T=T, Q=Q, match=match, mismatch=mismatch, qgap=qgap,
        tgap=tgap, pam_gate=pam_gate, emit_ranges=emit_ranges, packed=packed,
    )
    out_specs = [
        pl.BlockSpec(
            (1, 2, SUBLANES, LANES), lambda i, g: (g, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((G, 2, n_blocks * SUBLANES, LANES), jnp.int32),
    ]
    if emit_ranges:
        out_specs.append(
            pl.BlockSpec(
                (1, 2, 2, SUBLANES, LANES), lambda i, g: (g, 0, 0, i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct(
                (G, 2, 2, n_blocks * SUBLANES, LANES), jnp.int32
            )
        )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, G),  # guide dim innermost: the window block is
        # revisited across guides without re-fetching from HBM
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (tcols.shape[0], SUBLANES, LANES), lambda i, g: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=16 * T * Q * n_blocks * BLOCK_W * G,
            bytes_accessed=tcols.shape[0] * n_blocks * BLOCK_W * 4 * G,
            transcendentals=0,
        ),
    )(qvals, jnp.asarray(min_scores, jnp.int32).reshape(G), tcols)
    if emit_ranges:
        return out[0], out[1]
    return out[0]
