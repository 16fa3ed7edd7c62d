"""Benchmark harness: genome-bases-scanned/s for the SearchReference
screen engine on one chip.

Workload: the hot loop of a genome-wide off-target search — every
overlapping window of a genome screened on both strands with the exact
int32 glocal-DP kernel (guide 20nt, window 1024, reference default
overlap math).  The genome is device-resident (production staging model:
upload once, search many guides); the benchmark generates it on device to
keep the measurement transfer-free.

Baseline: the single-host CPU engine (NumPy oracle DP, our stand-in for
the reference's JVM thread-pool engine scaled to 8 threads — the
reference publishes no numbers, see BASELINE.md).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from calitas_tpu.core.scoring import derive_scorer
    from calitas_tpu.core.sequence import encode_query
    from calitas_tpu.core.guide import Guide
    from calitas_tpu.ops.genome_screen import _screen_genome, BLOCK_W

    guide = Guide.parse("CTTGCCCCACAGGGCAGTAAnrg")  # README example guide
    dp_query = guide.guide_fw
    Q = len(dp_query)
    window = 1024
    overlap = guide.length + 5 + 3 - 1  # guideLen+maxGuideDiffs+maxGaps-1
    step = window - overlap
    batch_windows = 8192

    # Default 1 Gb: large enough to amortize the fixed dispatch cost the
    # way a real (hg38-scale) search does.
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 1024.0
    G = int(genome_mb * 1e6)

    n_windows = max((G - 1) // step, 1)
    n_batches = -(-n_windows // batch_windows)
    need = (n_batches * batch_windows - 1) * step + window + step

    # Generate the genome's mask array directly on device: pure arithmetic
    # (1 << hash2bits) — table gathers are pathological on TPU.
    from functools import partial as _partial

    @_partial(jax.jit, static_argnums=1)
    def gen_genome(key, n):
        bits = jax.random.bits(key, (n,), dtype=jnp.uint8) & 3
        return (jnp.uint8(1) << bits).astype(jnp.uint8)

    genome = gen_genome(jax.random.PRNGKey(7), max(G + window, need))
    genome.block_until_ready()

    scorer = derive_scorer()
    from calitas_tpu.core.sequence import revcomp

    qv_fw = jnp.asarray(encode_query(dp_query).astype(np.int32)[None, :])
    qv_rc = jnp.asarray(encode_query(revcomp(dp_query)).astype(np.int32)[None, :])

    use_pallas = jax.default_backend() == "tpu"
    pam_spec = (
        ((tuple(int(m) for m in encode_query("nrg")),), 1, 3)
        if use_pallas
        else None
    )
    kw = dict(
        window=window, step=step, batch_windows=batch_windows,
        max_batches=n_batches, Q=Q,
        match=scorer.match_score, mismatch=scorer.mismatch_score,
        qgap=scorer.query_gap_score, tgap=scorer.target_gap_score,
        use_pallas=use_pallas, pam_spec=pam_spec,
    )

    # Candidate threshold (guide-only min score at 5 diffs), applied on
    # device; the screen returns bit-packed per-chain candidate flags.
    thr = jnp.int32(scorer.match_score * Q + 5 * -122)

    # Warmup / compile, then timed runs.  Best-of-3 guards against the
    # tunneled-device dispatch stalls seen in dev environments.
    nb = jnp.int32(n_batches)
    np.asarray(_screen_genome(genome, qv_fw, qv_rc, nb, thr, **kw))
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        packed = np.asarray(_screen_genome(genome, qv_fw, qv_rc, nb, thr, **kw))
        elapsed = min(elapsed, time.perf_counter() - t0)

    device_bps = G / elapsed  # genome bases scanned (both strands) per second

    # Host-engine baseline: exact NumPy DP on a window sample, extrapolated
    # to 8 threads (the reference default).
    from calitas_tpu.align.oracle import dp_matrix

    rng = np.random.default_rng(0)
    qmask = encode_query(dp_query)
    sample = rng.integers(1, 15, size=(8, window), dtype=np.uint8)
    t0 = time.perf_counter()
    for row in sample:
        dp_matrix(qmask, row, scorer)  # one strand
    host_elapsed = time.perf_counter() - t0
    host_bps_1t = (len(sample) * step) / (host_elapsed * 2)  # both strands
    host_bps = host_bps_1t * 8

    # packed is [2, n_total//8] bit-packed per-chain flags; a window is a
    # candidate when either chain reaches the guide-only threshold
    from calitas_tpu.ops.genome_screen import _unpack_flag_bits

    flags = _unpack_flag_bits(packed, n_windows)
    n_cand = int(flags.any(axis=0).sum())
    print(
        json.dumps(
            {
                "metric": "genome bases scanned/s (SearchReference screen, 1 chip, both strands)",
                "value": round(device_bps),
                "unit": "bases/s",
                "vs_baseline": round(device_bps / host_bps, 2),
            }
        )
    )
    print(
        f"# device={jax.default_backend()} pallas={use_pallas} genome={genome_mb}Mb "
        f"windows={n_windows} elapsed={elapsed:.3f}s candidates={n_cand} "
        f"host8t_baseline={host_bps:.0f} bases/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
