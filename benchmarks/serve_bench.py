"""Resident-serving benchmark: stage a genome once, warm up (the CLI
Serve default), answer N whole-genome SearchReference requests, and
report first-request vs warm-request latency (VERDICT r4 item 6's done
criterion: first real request <= 1.5x a warm one when warmup ran).

Usage: python benchmarks/serve_bench.py [fasta] [n_requests] [--no-warmup]
Defaults to the hg38-scale genome built by benchmarks/hg38_scale.py.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from calitas_tpu.serve import ResidentSearcher

GUIDES = [
    ("g0", "CTTGCCCCACAGGGCAGTAAnrg"),
    ("g1", "ACGTACATGCTCGATACGACnrg"),
    ("g2", "TTGACCAAGCAAAACAGACCnrg"),
]


def main() -> None:
    fa = (
        Path(sys.argv[1])
        if len(sys.argv) > 1
        else Path(__file__).parent / "out" / "hg38" / "hg38_3100000000_8.fa"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    do_warmup = "--no-warmup" not in sys.argv
    t0 = time.perf_counter()
    searcher = ResidentSearcher(fa)
    print(f"staged {fa.name} in {time.perf_counter() - t0:.1f}s", flush=True)
    if do_warmup:  # the CLI Serve default
        t0 = time.perf_counter()
        searcher.warmup()
        print(f"warmup in {time.perf_counter() - t0:.1f}s", flush=True)
    times = []
    for i in range(n):
        gid, guide = GUIDES[i % len(GUIDES)]
        t0 = time.perf_counter()
        table = searcher.search(guide=guide, guide_id=gid)
        dt = time.perf_counter() - t0
        times.append(dt)
        rows = table.count("\n") - 1
        print(f"request {i} ({gid}): {dt:.1f}s, {rows} rows", flush=True)
    if len(times) >= 2:
        warm = min(times[1:])
        print(
            f"first request {times[0]:.1f}s vs warm {warm:.1f}s -> "
            f"{times[0] / warm:.2f}x (target <= 1.5x with warmup)",
            flush=True,
        )


if __name__ == "__main__":
    main()
