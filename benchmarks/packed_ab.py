"""Packed-tcols A/B (VERDICT r4 item 3): in ONE process, interleaved,
compare the production screen with the 4-bytes-per-int32 packed kernel
layout (`pack_tcols_jax`) against the legacy one-int32-per-column
transpose.  The packing cuts the pre-kernel relayout traffic 4x (the
relayout was write-bandwidth-bound on the int32 expansion at ~1.5x the
DP kernel's own time).

Usage: python benchmarks/packed_ab.py [genome_Mb=256] [reps=4]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import bench as benchmod
from calitas_tpu.align.engine import SequentialAligner
from calitas_tpu.core.guide import Guide
from calitas_tpu.core.sequence import revcomp
from calitas_tpu.ops.genome_screen import GenomeScreen

KW = dict(max_guide_diffs=5, max_pam_diffs=1,
          max_gaps_between_guide_and_pam=3, max_total_diffs=9,
          max_overlap=10)


def main() -> None:
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 256.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    G = int(genome_mb * 1e6)

    guide = Guide.parse(benchmod.GUIDE)
    aligner = SequentialAligner()
    window, step = 1000, 1000 - (len(benchmod.GUIDE) + 5 + 3 - 1)
    dp_query = guide.guide_fw
    min_score = aligner.min_guide_score(guide, KW["max_guide_diffs"])
    pam_spec = (tuple(guide.pams_fw), 1, 3)

    np.asarray(jnp.arange(8).sum())  # absorb first-dispatch stall
    padded_len = 1 << (G + window - 1).bit_length()
    genome_dev = benchmod.device_genome_masks(padded_len, G)
    np.asarray(genome_dev[:8])

    screens = {
        # production: packed words + gate bits staged once per contig
        "packed+staged": GenomeScreen(aligner.scorer, window=window,
                                      packed_tcols=True, pam_staged=True),
        "packed": GenomeScreen(aligner.scorer, window=window,
                               packed_tcols=True, pam_staged=False),
        "legacy": GenomeScreen(aligner.scorer, window=window,
                               packed_tcols=False, pam_staged=False),
    }
    state: dict = {}

    def run(key):
        state[key] = screens[key].screen_contig(
            genome_dev, G, step, dp_query, revcomp(dp_query), min_score,
            pam_spec=pam_spec, return_ranges=True,
        )

    for k in screens:
        run(k)  # warm/compile (untimed)
    best = {k: float("inf") for k in screens}
    seq = []
    for _ in range(reps):
        for k in screens:
            t0 = time.perf_counter()
            run(k)
            dt = time.perf_counter() - t0
            best[k] = min(best[k], dt)
            seq.append(f"{k[0]}={dt:.3f}")
    cf_p, rg_p = state["packed"]
    cf_l, rg_l = state["legacy"]
    same = (np.array_equal(cf_p, cf_l) and np.array_equal(rg_p, rg_l))
    cf_s, rg_s = state["packed+staged"]
    # staged gate flags are a conservative superset of the window-local
    # gate (annotate_genome_pam docstring); ranges only matter where
    # flagged, and staged ranges must cover the batch-local ones.
    superset = not np.any(cf_l & ~cf_s)
    cells = G / step * window * len(dp_query) * 2
    print("sequence:", " ".join(seq))
    b = best
    print(
        f"packed+staged {b['packed+staged']:.3f}s "
        f"({G / b['packed+staged'] / 1e9:.2f} Gb/s, "
        f"{cells / b['packed+staged'] / 1e9:.0f} Gcells/s) vs packed "
        f"{b['packed']:.3f}s vs legacy {b['legacy']:.3f}s -> "
        f"staged {b['legacy'] / b['packed+staged']:.2f}x, "
        f"packed {b['legacy'] / b['packed']:.2f}x; "
        f"packed==legacy: {same}; staged superset: {superset} "
        f"(+{int(cf_s.sum() - cf_l.sum())} extra flags of {int(cf_l.sum())})"
    )
    if not same:
        raise SystemExit("MISMATCH: packed and legacy outputs differ")
    if not superset:
        raise SystemExit("MISMATCH: staged flags miss batch-local flags")


if __name__ == "__main__":
    main()
