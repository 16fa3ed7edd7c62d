"""TPU execution of the genome search: device-resident screen, host finish.

The TPU-first execution strategy for SearchReference (SURVEY.md §2.10,
§7): each contig's mask array is staged to device HBM once; the device
extracts every search window, screens both strands with the exact int32
DP kernel, and returns one flag per window.  Only flagged windows (hits
are sparse — O(10^-3) of windows at default thresholds) are materialized
with the reference's exact window semantics (N-trim, uppercase) and run
through the host alignment engine.  Output is therefore bit-identical to
the host-only path.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from calitas_tpu.core.guide import Guide
from calitas_tpu.core.sequence import revcomp
from calitas_tpu.align.engine import SequentialAligner
from calitas_tpu.align.guide_alignment import GuideAlignment
from calitas_tpu.io.fasta import IndexedFasta
from calitas_tpu.ops.genome_screen import GenomeScreen
from calitas_tpu.search.windows import RefWindow, materialize_window


def screened_contig_search(
    fasta: IndexedFasta,
    chrom: Optional[str],
    guide: Guide,
    aligner: SequentialAligner,
    *,
    window_size: int,
    step_size: int,
    guide_length: int,
    batch_windows: int = 8192,
    threads: int = 1,
    **align_kwargs,
) -> Iterator[tuple[RefWindow, list[GuideAlignment]]]:
    """Yield (window, alignments) for every window that produces hits,
    in the same window order as the host path."""
    screen = GenomeScreen(
        aligner.scorer, window=window_size, batch_windows=batch_windows
    )
    min_score = aligner.min_guide_score(guide, align_kwargs["max_guide_diffs"])
    dp_query = guide.guide_rc if guide.pam_is_5prime else guide.guide_fw
    dp_query_rc = revcomp(dp_query)

    contigs = (
        [(chrom, fasta.get_bases(chrom))] if chrom is not None else fasta.iter_contigs()
    )
    for name, bases in contigs:
        if len(bases) < 2:
            continue
        genome_dev = screen.stage(bases)
        flags = screen.screen_contig(
            genome_dev, len(bases), step_size, dp_query, dp_query_rc, min_score
        )
        starts = screen.window_starts(len(bases), step_size)
        candidates = (
            materialize_window(name, bases, int(starts[i]), window_size)
            for i in np.nonzero(flags)[0]
        )
        candidates = (w for w in candidates if len(w.bases) >= guide_length)

        def task(w):
            return aligner.align(
                guide,
                w.bases,
                target_name=w.chrom,
                target_offset=w.start - 1,
                **align_kwargs,
            )

        from calitas_tpu.parallel.host_pool import map_windows

        for w, results in map_windows(candidates, task, threads):
            if results:
                yield w, results
