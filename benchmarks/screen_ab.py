"""Screen-variant A/B + kernel roofline (VERDICT r3 item 6).

Quantifies, in ONE process with interleaved A/B/A/B timing (the only
valid comparison on the tunnel-phased dev TPU — CLAUDE.md):

  1. device screen: production (PAM-gated end columns + end-column
     ranges) vs round-1 style (plain flags) — the kernel-side cost of
     the gate + ranges, and the candidate reduction the gate buys;
  2. host finish: sliced (range-bounded DP columns) vs full-width DP on
     the SAME candidate windows — the host-side savings the ranges buy;
  3. kernel roofline: the production dual-chain DP kernel's Gcells/s
     against a measured VPU ceiling — a dependency-structured
     add+max chain kernel (2 int32 ops/cell, the irreducible DP
     recurrence shape) on identical tiles/grid — so "is the kernel
     fast" has a hardware denominator, not just a host baseline.

Usage: python benchmarks/screen_ab.py [genome_Mb=256] [reps=3]
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import bench as benchmod
from calitas_tpu.align.engine import SequentialAligner
from calitas_tpu.core.guide import Guide
from calitas_tpu.core.sequence import revcomp
from calitas_tpu.ops.genome_screen import GenomeScreen, range_block

KW = dict(
    max_guide_diffs=5, max_pam_diffs=1,
    max_gaps_between_guide_and_pam=3, max_total_diffs=9, max_overlap=10,
)


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def interleave(variants: dict, reps: int) -> dict:
    """Run variants A B A B ... and keep the best rep per variant."""
    best = {k: float("inf") for k in variants}
    for _ in range(reps):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            best[k] = min(best[k], time.perf_counter() - t0)
    return best


# --------------------------------------------------------------------------
# 3. VPU ceiling kernel: the DP recurrence's dependency shape (row i
# depends on row i-1 in the same column AND on row i of the previous
# column) at the minimum 2 int32 ops per cell (one add, one max).
# --------------------------------------------------------------------------

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from calitas_tpu.ops.dp_pallas2 import BLOCK_W, LANES, SUBLANES


def _ceiling_kernel(bias_ref, tcols_ref, out_ref, *, T: int, Q: int):
    zeros = jnp.zeros((SUBLANES, LANES), jnp.int32)
    init = tuple(zeros for _ in range(Q + 1))
    best0 = jnp.full((SUBLANES, LANES), -(2**30), jnp.int32)
    bias = bias_ref[0]

    def body(j, carry):
        state, best = carry
        tcol = tcols_ref[j] + bias
        new = [tcol]
        for i in range(1, Q + 1):
            # one add + one max per cell: the irreducible DP shape
            new.append(jnp.maximum(state[i] + jnp.int32(1), new[i - 1]))
        return tuple(new), jnp.maximum(best, new[Q])

    _, best = jax.lax.fori_loop(0, T, body, (init, best0))
    out_ref[:, :] = best


#: independent accumulator count of the peak-throughput probe (enough
#: ILP to fill the VPU pipelines; the chain probe has ILP 1)
PEAK_C = 8


def _peak_kernel(bias_ref, tcols_ref, out_ref, *, T: int, Q: int):
    best0 = tuple(
        jnp.full((SUBLANES, LANES), c, jnp.int32) for c in range(PEAK_C)
    )
    bias = bias_ref[0]

    def body(j, accs):
        tcol = tcols_ref[j] + bias
        out = []
        for c, acc in enumerate(accs):
            for _i in range(Q):
                # add + max, fully independent across the C accumulators
                acc = jnp.maximum(acc + jnp.int32(c + 1), tcol)
            out.append(acc)
        return tuple(out)

    accs = jax.lax.fori_loop(0, T, body, best0)
    best = accs[0]
    for acc in accs[1:]:
        best = jnp.maximum(best, acc)
    out_ref[:, :] = best


def _probe_call(kernel, bias, tcols, *, T: int, Q: int, ops_per_col: int):
    n_blocks = tcols.shape[1] // SUBLANES
    return pl.pallas_call(
        partial(kernel, T=T, Q=Q),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (T, SUBLANES, LANES), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * SUBLANES, LANES), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=ops_per_col * T * n_blocks * BLOCK_W,
            bytes_accessed=T * n_blocks * BLOCK_W * 4,
            transcendentals=0,
        ),
    )(bias.reshape(1), tcols)


def main() -> None:
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 256.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    G = int(genome_mb * 1e6)

    guide = Guide.parse(benchmod.GUIDE)
    aligner = SequentialAligner()
    window, step = 1000, 1000 - (len(benchmod.GUIDE) + 5 + 3 - 1)
    dp_query = guide.guide_fw
    min_score = aligner.min_guide_score(guide, KW["max_guide_diffs"])
    pam_spec = (tuple(guide.pams_fw), 1, 3)

    np.asarray(jnp.arange(8).sum())  # absorb first-dispatch stall

    screen = GenomeScreen(aligner.scorer, window=window)
    padded_len = 1 << (G + window - 1).bit_length()
    genome_dev = benchmod.device_genome_masks(padded_len, G)
    _sync(genome_dev)

    # ---- 1. device screen A/B -------------------------------------
    # Four variants isolate the PAM gate (kernel cost) from the ranges
    # (extra D2H: 4 bytes/window — free on attached TPUs, visible over
    # the dev tunnel's ~30 MB/s link).
    state: dict = {}

    def _screen(key, pam, ranges):
        def run():
            state[key] = screen.screen_contig(
                genome_dev, G, step, dp_query, revcomp(dp_query), min_score,
                pam_spec=pam, return_ranges=ranges,
                return_chains=not ranges,
            )
        return run

    variants = {
        "gate+ranges": _screen("gr", pam_spec, True),   # production
        "ranges": _screen("r", None, True),
        "gate": _screen("g", pam_spec, False),
        "flags": _screen("f", None, False),             # round-1 style
    }
    for fn in variants.values():
        fn()  # warm/compile (untimed)
    t = interleave(variants, reps)
    cf_prod, ranges = state["gr"]
    n_prod = int(cf_prod.any(axis=0).sum())
    n_plain = int(state["f"].any(axis=0).sum())
    line = " | ".join(
        f"{k} {t[k]:.3f}s={G / t[k] / 1e9:.2f} Gb/s" for k in variants
    )
    print(f"screen A/B @ {genome_mb:g} Mb (best of {reps}, interleaved): {line}")
    print(
        f"PAM-gate kernel cost {t['gate+ranges'] / t['ranges']:.2f}x "
        f"(ranges held); ranges D2H cost {t['ranges'] / t['flags']:.2f}x "
        f"(tunnel artifact: {4 * len(cf_prod[0]) / 1e6:.1f} MB extra "
        f"readback); candidates: gated {n_prod} vs ungated {n_plain} "
        f"(gate keeps {100.0 * n_prod / max(n_plain, 1):.1f}%)"
    )

    # ---- 2. host finish A/B on the SAME candidates -----------------
    from calitas_tpu.align.batch import (
        chain_ranges_to_pass,
        finish_windows,
        max_target_span,
    )

    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    idx = np.nonzero(cf_prod.any(axis=0))[0]
    idx = idx[: min(len(idx), 4096)]
    starts = screen.window_starts(G, step)
    rb = range_block(window)
    Q = len(dp_query)
    windows, passes, rrows = [], [], []
    for i in idx:
        s0 = int(starts[i])
        wb = letters[benchmod.host_genome_codes(s0, window)]
        T = len(wb)
        cr = (
            int(ranges[0, i, 0]) * rb + 1, (int(ranges[0, i, 1]) + 1) * rb,
            int(ranges[1, i, 0]) * rb + 1, (int(ranges[1, i, 1]) + 1) * rb,
        )
        span = max_target_span(
            Q, aligner.scorer.match_score, aligner.scorer.query_gap_score,
            min_score, T,
        )
        windows.append(("chr1", s0 + 1, wb))
        passes.append(("fwd", "rev"))
        rrows.append(chain_ranges_to_pass(cr, 0, T, span))
    rr = np.asarray(rrows, np.int32)

    fin = {}

    def sliced():
        fin["s"] = finish_windows(guide, aligner, windows, passes,
                                  ranges=rr, **KW)

    def full():
        fin["f"] = finish_windows(guide, aligner, windows, passes,
                                  ranges=None, **KW)

    sliced(); full()
    tf = interleave({"sliced": sliced, "full": full}, reps)
    n = len(windows)
    ks = [len(a) for a in fin["s"]]
    kf = [len(a) for a in fin["f"]]
    assert ks == kf, "sliced finish diverged from full finish"
    print(
        f"finish A/B on {n} candidates: sliced {tf['sliced']:.3f}s "
        f"({1e6 * tf['sliced'] / n:.1f} us/cand) | full {tf['full']:.3f}s "
        f"({1e6 * tf['full'] / n:.1f} us/cand) | ranges save "
        f"{tf['full'] / tf['sliced']:.2f}x host finish"
    )

    # ---- 3. kernel Gcells/s + VPU ceiling ---------------------------
    from calitas_tpu.ops.dp_pallas2 import _pallas_screen_dual

    from calitas_tpu.core.sequence import encode_query

    T, NW = 1024, 32768  # NW windows of T columns: [T, NW/LANES, LANES]
    rng = np.random.default_rng(0)
    tcols = jnp.asarray(
        rng.integers(1, 16, size=(T, NW // LANES, LANES),
                     dtype=np.int64).astype(np.int32)
        | (3 << 4)  # PAM bits set so the gated variant does full work
    )
    qv = jnp.asarray(
        np.stack([
            encode_query(dp_query).astype(np.int32),
            encode_query(revcomp(dp_query)).astype(np.int32),
        ])
    )
    skw = dict(
        Q=Q, match=aligner.scorer.match_score,
        mismatch=aligner.scorer.mismatch_score,
        qgap=aligner.scorer.query_gap_score,
        tgap=aligner.scorer.target_gap_score,
    )
    n_windows = NW
    cells = 2 * Q * T * n_windows  # dual chain per kernel call
    R = 64  # kernel calls per timed megacall (amortizes the ~28 ms
    #          tunnel dispatch; one jitted megacall is the only reliable
    #          timing unit on this link — CLAUDE.md)

    @partial(jax.jit, static_argnames=("variant",))
    def mega(tcols, variant: str):
        def body(i, acc):
            # the queries depend on the previous iteration's result so
            # XLA cannot hoist/CSE the kernel out of the loop (a [2, Q]
            # add — free next to the kernel)
            qv2 = qv + (acc >> 31)
            if variant == "plain":
                o = _pallas_screen_dual(qv2, tcols, **skw)
            elif variant == "gated":
                o, rgo = _pallas_screen_dual(
                    qv2, tcols, min_score, pam_gate=True, emit_ranges=True,
                    **skw,
                )
                o = o + rgo[0, 0]
            elif variant == "chain":
                o = _probe_call(_ceiling_kernel, acc >> 31, tcols,
                                T=T, Q=Q, ops_per_col=2 * Q)[None]
            else:  # peak
                o = _probe_call(_peak_kernel, acc >> 31, tcols,
                                T=T, Q=Q, ops_per_col=2 * Q * PEAK_C)[None]
            return acc + o[..., :1, :1].sum()

        return jax.lax.fori_loop(0, R, body, jnp.int32(0))

    out = {}

    def k_plain():
        out["p"] = np.asarray(mega(tcols, "plain"))

    def k_gated_ranges():
        out["g"] = np.asarray(mega(tcols, "gated"))

    def k_chain():
        out["c"] = np.asarray(mega(tcols, "chain"))

    def k_peak():
        out["k"] = np.asarray(mega(tcols, "peak"))

    k_plain(); k_gated_ranges(); k_chain(); k_peak()
    tk = interleave(
        {"plain": k_plain, "gated+ranges": k_gated_ranges,
         "chain": k_chain, "peak": k_peak}, reps,
    )
    gc_plain = R * cells / tk["plain"] / 1e9
    gc_gated = R * cells / tk["gated+ranges"] / 1e9
    print(
        f"per-call ms: plain {1e3 * tk['plain'] / R:.2f} | gated+ranges "
        f"{1e3 * tk['gated+ranges'] / R:.2f} | chain "
        f"{1e3 * tk['chain'] / R:.2f} | peak {1e3 * tk['peak'] / R:.2f}"
    )
    print(
        f"kernel megacall ({R}x [{T}x{n_windows}] Q={Q}): "
        f"plain {gc_plain:.0f} Gcells/s | gated+ranges {gc_gated:.0f} "
        f"Gcells/s ({gc_plain / gc_gated:.2f}x cost)"
    )
    # Roofline denominators, both measured on identical tiles/grid:
    #  - chain: ILP-1 dependent add+max (latency floor of the recurrence)
    #  - peak:  8 independent add+max streams (VPU throughput ceiling)
    chain_rows = R * Q * T * n_windows / tk["chain"] / 1e9
    peak_ops = R * 2 * Q * PEAK_C * T * n_windows / tk["peak"] / 1e9
    # production kernel: ~8 VPU ops per cell (and/cmp/select/3 adds/2 max)
    prod_ops = 8 * R * cells / tk["plain"] / 1e9
    print(
        f"roofline: dependency floor {chain_rows:.0f} Grows/s/chain "
        f"(production runs 2 chains at {gc_plain / 2:.0f} each = "
        f"{100.0 * (gc_plain / 2) / chain_rows:.0f}% of the ILP-1 floor "
        f"rate); VPU throughput ceiling {peak_ops / 1e3:.2f} Tops/s int32, "
        f"production sustains ~{prod_ops / 1e3:.2f} Tops/s at ~8 ops/cell "
        f"= {100.0 * prod_ops / peak_ops:.0f}% of peak"
    )


if __name__ == "__main__":
    main()
