"""SearchReference: genome-wide off-target search.

Parity contract: SearchReference.scala:402-676 (SURVEY.md §2.7, §3.1/3.2).
Two passes — plain reference windows, then (optionally) variant haplotype
windows — feed the same aligner; hits get globally deduped to canonical
per-locus alignments, sorted in dictionary order, and written as the
34-column table.

Execution engines:
  - ``host``: every window is aligned with the exact host engine.
  - ``tpu`` (default when JAX sees an accelerator): windows are batched to
    the device DP *screen* kernel, which computes exact final-row DP scores
    for every window x strand; only windows with a qualifying end column
    (sparse) are handed to the host engine for traceback + PAM extension.
    The screen is exact (integer DP), so results are identical.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional, Sequence

from calitas_tpu.core.guide import Guide
from calitas_tpu.core.scoring import Defaults
from calitas_tpu.align.engine import SequentialAligner
from calitas_tpu.io.fasta import IndexedFasta, extract_dictionary
from calitas_tpu.io.tsv import MetricWriter, open_output
from calitas_tpu.search.hits import HitBuilder, ReferenceHit, remove_overlaps, sort_hits
from calitas_tpu.search.windows import window_iterator
from calitas_tpu.utils import camel_to_gnu

logger = logging.getLogger("calitas_tpu.SearchReference")


def core_parameters_string(
    max_variants, window_size, max_guide_diffs, max_pam_mismatches,
    max_gaps_between_guide_and_pam, max_total_diffs_actual, max_overlap,
    guide_mismatch_net_cost, pam_mismatch_net_cost, genome_gap_net_cost,
    guide_gap_net_cost,
) -> str:
    """The aligner_other_parameters column (SearchReference.scala:496-508)."""
    params = {
        "maxVariants": max_variants,
        "windowSize": window_size,
        "maxGuideDiffs": max_guide_diffs,
        "maxPamMismatches": max_pam_mismatches,
        "maxGapsBetweenGuideAndPam": max_gaps_between_guide_and_pam,
        "maxTotalDiffs": max_total_diffs_actual,
        "maxOverlap": max_overlap,
        "guideMismatchNetCost": guide_mismatch_net_cost,
        "pamMismatchNetCost": pam_mismatch_net_cost,
        "genomeGapNetCost": genome_gap_net_cost,
        "guideGapNetCost": guide_gap_net_cost,
    }
    return ";".join(sorted(f"{camel_to_gnu(k)}={v}" for k, v in params.items()))


def run(
    guide: str,
    guide_id: str,
    ref: str | Path,
    auxiliary_pams: Sequence[str] = (),
    variants: Optional[str | Path] = None,
    max_variants: int = Defaults.MAX_VARIANTS_IN_CLUSTER,
    output: Optional[str | Path] = None,
    threads: int = 8,
    window_size: int = 1000,
    max_guide_diffs: int = Defaults.MAX_GUIDE_DIFFS,
    max_pam_mismatches: int = Defaults.MAX_PAM_MISMATCHES,
    max_gaps_between_guide_and_pam: int = Defaults.MAX_GAPS_BETWEEN_GUIDE_AND_PAM,
    max_total_diffs: Optional[int] = None,
    max_overlap: int = Defaults.MAX_OVERLAP,
    guide_mismatch_net_cost: int = Defaults.MISMATCH_NET_COST,
    pam_mismatch_net_cost: int = Defaults.PAM_MISMATCH_NET_COST,
    genome_gap_net_cost: int = Defaults.GENOME_GAP_NET_COST,
    guide_gap_net_cost: int = Defaults.GUIDE_GAP_NET_COST,
    chrom: Optional[str] = None,
    engine: str = "auto",  # 'auto' | 'host' | 'tpu'
) -> None:
    ref = Path(ref)
    dictionary = extract_dictionary(ref)  # required (SearchReference.scala:478-484)
    ref_file = IndexedFasta(ref)

    aligner = SequentialAligner(
        mismatch_net_cost=guide_mismatch_net_cost,
        pam_mismatch_net_cost=pam_mismatch_net_cost,
        genome_gap_net_cost=genome_gap_net_cost,
        guide_gap_net_cost=guide_gap_net_cost,
    )
    max_total_diffs_actual = (
        max_total_diffs
        if max_total_diffs is not None
        else max_guide_diffs + max_gaps_between_guide_and_pam + max_pam_mismatches
    )
    arguments = core_parameters_string(
        max_variants, window_size, max_guide_diffs, max_pam_mismatches,
        max_gaps_between_guide_and_pam, max_total_diffs_actual, max_overlap,
        guide_mismatch_net_cost, pam_mismatch_net_cost, genome_gap_net_cost,
        guide_gap_net_cost,
    )
    query = Guide.parse(guide, auxiliary_pams)

    hits: list[ReferenceHit] = []
    hit_builder = HitBuilder(
        guide_id=guide_id,
        guide=query,
        ref=ref_file,
        vcf=variants,
        aligner_id="CALITAS:SearchReference",
        arguments=arguments,
    )

    align_kwargs = dict(
        max_guide_diffs=max_guide_diffs,
        max_pam_diffs=max_pam_mismatches,
        max_gaps_between_guide_and_pam=max_gaps_between_guide_and_pam,
        max_total_diffs=max_total_diffs_actual,
        max_overlap=max_overlap,
    )

    # ------------------------------------------------------------------
    # Pass 1: the unaltered reference (SearchReference.scala:527-564)
    # ------------------------------------------------------------------
    guide_length = len(guide)
    window_overlap = (
        guide_length + max_guide_diffs + max_gaps_between_guide_and_pam - 1
    )
    step_size = window_size - window_overlap
    logger.info("Aligning to reference genome without variants.")

    from calitas_tpu.utils import ProgressLogger

    progress = ProgressLogger(logger, noun="windows", verb="Processed", unit=25_000)
    use_tpu = _resolve_engine(engine)
    if use_tpu:
        from calitas_tpu.parallel.screen_runner import screened_contig_search

        for window, results in screened_contig_search(
            ref_file, chrom, query, aligner,
            window_size=window_size, step_size=step_size,
            guide_length=guide_length, threads=threads, **align_kwargs,
        ):
            for a in results:
                hits.append(hit_builder.build(a))
            progress.record(window.chrom, window.start)
    else:
        from calitas_tpu.parallel.host_pool import map_windows

        windows = (
            w
            for w in window_iterator(ref_file, window_size, step_size, chrom)
            if len(w.bases) >= guide_length
        )

        def task(window):
            return aligner.align(
                query,
                window.bases,
                target_name=window.chrom,
                target_offset=window.start - 1,
                **align_kwargs,
            )

        for window, results in map_windows(windows, task, threads):
            for a in results:
                hits.append(hit_builder.build(a))
            progress.record(window.chrom, window.start)

    logger.info("Reference windows processed.")

    # ------------------------------------------------------------------
    # Pass 2: reference with variants (SearchReference.scala:570-630)
    # ------------------------------------------------------------------
    if variants is not None:
        from calitas_tpu.search.variants import variant_window_iterator, flank_and_absolutize

        padding = query.length - 1 + max_guide_diffs + max_gaps_between_guide_and_pam
        vprogress = ProgressLogger(
            logger, noun="variant windows", verb="Processed", unit=100_000
        )
        for vwindow in variant_window_iterator(
            ref_file, variants, chrom, padding, max_variants
        ):
            relative = aligner.align(
                query,
                vwindow.bases,
                target_name=vwindow.chrom,
                target_offset=0,
                **align_kwargs,
            )
            absolute = flank_and_absolutize(relative, vwindow)
            for a in absolute:
                hits.append(hit_builder.build(a, vwindow.variants))
            vprogress.record(vwindow.chrom, vwindow.start)
        logger.info("Variant windows processed.")

    # ------------------------------------------------------------------
    # Sort, filter, output (SearchReference.scala:637-648)
    # ------------------------------------------------------------------
    logger.info("Sorting and Outputting.")
    keepers = remove_overlaps(hits, max_overlap, dictionary)

    if keepers:
        fwd_fraction = sum(1 for h in keepers if h.strand == "+") / len(keepers)
        if fwd_fraction > 0.52 or fwd_fraction < 0.48:
            logger.warning(
                "Strand imbalance: %f of alignments are on the F strand.",
                fwd_fraction,
            )

    out_fh = open_output(output)
    writer = MetricWriter(out_fh, ReferenceHit)
    writer.write_all(sort_hits(keepers, dictionary))
    writer.close()
    if out_fh is not sys.stdout:
        out_fh.close()


def _resolve_engine(engine: str) -> bool:
    if engine == "host":
        return False
    if engine == "tpu":
        return True
    # auto: use the device screen if an accelerator is present
    try:
        import jax

        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
