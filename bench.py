"""Benchmark harness: genome-bases-scanned/s for the DP screen engine.

Measures the hot loop of SearchReference — the batched glocal-DP screen
over fixed-size genome windows (both strands) — on the default JAX device,
and compares against the single-host CPU engine (the NumPy oracle, our
stand-in for the reference's JVM thread-pool engine; the reference
publishes no numbers, BASELINE.md).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_genome(n_bases: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n_bases)


def main() -> None:
    import jax

    from calitas_tpu.core.scoring import derive_scorer
    from calitas_tpu.core.sequence import MASK_TABLE
    from calitas_tpu.ops.dp_screen import ScreenKernel
    from calitas_tpu.parallel.screen_runner import _rc_masks

    guide = "CTTGCCCCACAGGGCAGTAA"  # 20nt protospacer (README example)
    Q = len(guide)
    window_size = 1024
    overlap = 23 + 5 + 3 - 1  # guide+pam len + maxGuideDiffs + maxGaps - 1
    step = window_size - overlap
    batch_windows = 256  # -> 512 rows with both strands

    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    genome = build_genome(int(genome_mb * 1e6))
    gmask = MASK_TABLE[genome]

    scorer = derive_scorer()
    kernel = ScreenKernel(scorer)
    qmask = MASK_TABLE[np.frombuffer(guide.encode(), dtype=np.uint8)]

    # Pack windows (fw + rc) into fixed-shape batches.
    starts = list(range(0, len(genome) - Q, step))
    batches = []
    for i in range(0, len(starts), batch_windows):
        chunk = starts[i : i + batch_windows]
        tm = np.zeros((2 * batch_windows, window_size), dtype=np.uint8)
        ln = np.zeros(2 * batch_windows, dtype=np.int32)
        for k, s in enumerate(chunk):
            w = gmask[s : s + window_size]
            tm[k, : len(w)] = w
            tm[batch_windows + k, : len(w)] = _rc_masks(w)
            ln[k] = ln[batch_windows + k] = len(w)
        batches.append((tm, ln))

    # Warmup / compile.
    kernel.max_scores(qmask, batches[0][0], batches[0][1]).sum()

    t0 = time.perf_counter()
    n_hit_rows = 0
    for tm, ln in batches:
        best = kernel.max_scores(qmask, tm, ln)
        n_hit_rows += int((best >= scorer.match_score * Q - 5 * 122).sum())
    elapsed = time.perf_counter() - t0

    scanned_bases = sum(int(ln.sum()) // 2 for _, ln in batches)  # fw strand bases
    device_bps = scanned_bases / elapsed

    # Host-engine baseline on a small sample, extrapolated.
    from calitas_tpu.align.oracle import dp_matrix

    sample = batches[0][0][:8]
    t0 = time.perf_counter()
    for row in sample:
        dp_matrix(qmask, row, scorer)
    host_elapsed = time.perf_counter() - t0
    host_bps = (8 * window_size / 2) / host_elapsed  # same both-strand accounting

    print(
        json.dumps(
            {
                "metric": "genome bases scanned/s (SearchReference DP screen, 1 chip)",
                "value": round(device_bps),
                "unit": "bases/s",
                "vs_baseline": round(device_bps / host_bps, 2),
            }
        )
    )
    print(
        f"# device={jax.default_backend()} genome={genome_mb}Mb windows={len(starts)} "
        f"elapsed={elapsed:.3f}s host_baseline={host_bps:.0f} bases/s hit_rows={n_hit_rows}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
