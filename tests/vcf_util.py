"""Test helper mirroring fgbio's VcfBuilder: synthesize small VCFs."""

from __future__ import annotations

from pathlib import Path

from calitas_tpu.io.vcf import VcfVariant


class VcfBuilder:
    def __init__(self, samples=()):
        self.samples = list(samples)
        self.variants: list[VcfVariant] = []

    def add(
        self,
        chrom: str,
        pos: int,
        id: str = ".",
        alleles=("A", "C"),
        info=None,
        filters=("PASS",),
        gts=(),
    ) -> "VcfBuilder":
        """First allele is REF, rest are ALTs (like fgbio VcfBuilder)."""
        info_pairs = tuple((k, v) for k, v in (info or {}).items())
        self.variants.append(
            VcfVariant(
                chrom=chrom,
                pos=pos,
                id=None if id in (".", "", None) else id,
                ref=alleles[0],
                alts=tuple(alleles[1:]),
                qual=None,
                filters=frozenset(filters),
                info=info_pairs,
                format="GT" if gts else None,
                genotypes=tuple(gts),
            )
        )
        return self

    def to_file(self, path: str | Path) -> Path:
        path = Path(path)
        with open(path, "w") as fh:
            fh.write("##fileformat=VCFv4.2\n")
            fh.write(
                '##INFO=<ID=AF,Number=A,Type=Float,Description="ALT allele frequency">\n'
            )
            fh.write('##FILTER=<ID=PASS,Description="Passes all filters.">\n')
            cols = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"]
            if self.samples:
                cols += ["FORMAT"] + self.samples
            fh.write("\t".join(cols) + "\n")
            for v in sorted(self.variants, key=lambda v: (v.chrom, v.pos)):
                info = (
                    ";".join(k if val == "" else f"{k}={val}" for k, val in v.info)
                    if v.info
                    else "."
                )
                row = [
                    v.chrom, str(v.pos), v.id or ".", v.ref,
                    ",".join(v.alts) if v.alts else ".",
                    ".", ";".join(sorted(v.filters)) if v.filters else ".", info,
                ]
                if self.samples:
                    row.append(v.format or "GT")
                    row.extend(v.genotypes)
                fh.write("\t".join(row) + "\n")
        return path
