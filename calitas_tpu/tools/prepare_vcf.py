"""PrepareVcf: VCF normalization for SearchReference.

Parity contract: PrepareVcf.scala (SURVEY.md §3.5): PASS + AF filtering,
simple alleles only, INFO reduced to AF, genotypes stripped, optional
contig-header override from a dictionary, optional 'chr' prefixing of
chromosomes 1-22/X/Y, multi-VCF merge.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Sequence

from calitas_tpu.io.fasta import SequenceDictionary, extract_dictionary
from calitas_tpu.io.vcf import (
    PASSING_FILTERS,
    VcfReader,
    VcfVariant,
    VcfWriter,
    format_af,
)

logger = logging.getLogger("calitas_tpu.PrepareVcf")

CHROMS_TO_FIX = frozenset([str(i) for i in range(1, 23)] + ["X", "Y"])


def fix_chrom(chrom: str) -> str:
    """Prepend 'chr' to chromosome names that need it (PrepareVcf.scala:91)."""
    return f"chr{chrom}" if chrom in CHROMS_TO_FIX else chrom


def run(
    input: Sequence[str | Path],
    output: str | Path,
    min_af: float = 0.01,
    dict_path: Optional[str | Path] = None,
    add_chr_prefix: bool = True,
) -> None:
    # Build the output header from the first input VCF (PrepareVcf.scala:41-58).
    first = VcfReader(input[0])
    header = first.header.copy()
    first.close()

    if dict_path is not None:
        d = extract_dictionary(dict_path)
        header.replace_contigs([(e.name, e.length, e.assembly) for e in d])
        if d.entries and d.entries[0].assembly:
            header.set_general("reference", d.entries[0].assembly)
    header.samples = []  # drop samples

    out = VcfWriter(output, header)
    from calitas_tpu.utils import ProgressLogger

    progress = ProgressLogger(logger, noun="variants", verb="wrote", unit=100_000)
    n = 0
    for vcf_in in input:
        logger.info("Processing file %s", vcf_in)
        reader = VcfReader(vcf_in)
        for v in reader:
            if v.filters != PASSING_FILTERS:
                continue
            afs = v.af()
            if afs is None or not any(af >= min_af for af in afs):
                continue
            if not v.alleles_are_simple():
                continue
            kept = [
                (alt, af) for alt, af in zip(v.alts, afs) if af >= min_af
            ]
            fixed = v.copy(
                chrom=fix_chrom(v.chrom) if add_chr_prefix else v.chrom,
                alts=tuple(alt for alt, _ in kept),
                info=(("AF", format_af([af for _, af in kept])),),
                format=None,
                genotypes=(),
            )
            out.write(fixed)
            progress.record(v.chrom, v.pos)
            n += 1
    out.close()
    logger.info("Wrote %d variants.", n)
