"""hg38-scale tool benchmarks: 3.1 Gb x 1 guide, x 4 guides, and the
gnomAD-scale variant pass, all through the real CLI tool path (staging
INCLUDED — this measures what a user sees end to end).

The genome is the bench.py murmur3 hash stream split into 8 contigs
(hg38's large-chromosome shape); variant positions/alleles derive from
the same stream so runs are deterministic.

Usage:
  python benchmarks/hg38_scale.py            # 3.1 Gb x 1 guide
  python benchmarks/hg38_scale.py guides4    # 3.1 Gb x 4 guides
  python benchmarks/hg38_scale.py variants   # 3.1 Gb + 3M-variant VCF
  python benchmarks/hg38_scale.py small      # 100 Mb smoke (1 contig)

The FASTA is built once under benchmarks/out/hg38/ and reused.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench as benchmod
from calitas_tpu.io.fasta import (
    DictEntry,
    SequenceDictionary,
    build_fai,
    dict_path_for,
)

OUT = Path(__file__).resolve().parent / "out" / "hg38"
GUIDES4 = [
    ("g0", benchmod.GUIDE, ()),
    ("g1", "ACGTACATGCTCGATACGACnrg", ()),
    ("g2", "TTGACCAAGCAAAACAGACCnrg", ()),
    ("g3", "GCATTTCAGGAGCTACGTTAnrg", ()),
]


def build_genome(total: int, n_contigs: int) -> Path:
    """Write the hash genome as an indexed multi-contig FASTA (cached)."""
    fa = OUT / f"hg38_{total}_{n_contigs}.fa"
    if fa.exists() and dict_path_for(fa).exists():
        return fa
    OUT.mkdir(parents=True, exist_ok=True)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    per = total // n_contigs
    entries = []
    line = 100
    with open(fa, "wb") as fh:
        off = 0
        for c in range(n_contigs):
            n = per if c < n_contigs - 1 else total - per * (n_contigs - 1)
            fh.write(f">chr{c + 1}\n".encode())
            for o in range(0, n, 1 << 26):
                k = min(1 << 26, n - o)
                chunk = letters[benchmod.host_genome_codes(off + o, k)]
                rows = k // line
                body = chunk[: rows * line].reshape(rows, line)
                outb = np.empty((rows, line + 1), np.uint8)
                outb[:, :line] = body
                outb[:, line] = ord("\n")
                fh.write(outb.tobytes())
                tail = chunk[rows * line :]
                if len(tail):
                    fh.write(tail.tobytes() + b"\n")
            entries.append(DictEntry(name=f"chr{c + 1}", length=n,
                                     assembly="hg38scale"))
            off += n
    build_fai(fa)
    SequenceDictionary(entries).write(dict_path_for(fa))
    return fa


def count_rows(path: Path) -> int:
    with open(path) as fh:
        return max(sum(1 for _ in fh) - 1, 0)


def run_search(fa: Path, tag: str, **kw) -> None:
    from calitas_tpu.tools import search_reference

    out = OUT / f"{tag}.txt"
    t0 = time.perf_counter()
    search_reference.run(ref=fa, output=out, **kw)
    dt = time.perf_counter() - t0
    total = sum(
        int(l.split("\t")[1]) for l in open(str(fa) + ".fai")
    )
    n_g = len(kw.get("guide_specs") or [1])
    print(
        f"{tag}: {dt:.1f}s e2e incl staging | "
        f"{total * n_g / dt / 1e6:.0f} Mguide-bases/s | "
        f"{count_rows(out)} rows"
    )


def make_vcf(fa: Path, n_variants: int) -> Path:
    """Deterministic PASS SNVs from the hash stream (gnomAD-scale)."""
    vcf = OUT / f"vars_{n_variants}.vcf"
    if vcf.exists():
        return vcf
    fai = [l.split("\t") for l in open(str(fa) + ".fai")]
    contigs = [(f[0], int(f[1])) for f in fai]
    total = sum(n for _, n in contigs)
    letters = "ACGT"
    with open(vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##INFO=<ID=AF,Number=A,Type=Float,Description="AF">\n')
        for name, n in contigs:
            fh.write(f"##contig=<ID={name},length={n}>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        base = 0
        stride = total // n_variants
        k = 0
        for name, n in contigs:
            pos = np.arange(1000, n - 1000, stride, dtype=np.int64)
            ref_codes = benchmod.host_genome_codes(base, n)[pos - 1]
            h = benchmod.host_genome_codes(7_000_000_000 + base, len(pos))
            for i, p in enumerate(pos):
                rb = letters[int(ref_codes[i])]
                alt = letters[(int(ref_codes[i]) + 1 + int(h[i]) % 3) % 4]
                af = 0.01 + (int(h[i]) % 50) / 100.0
                fh.write(
                    f"{name}\t{int(p)}\trs{k}\t{rb}\t{alt}\t50\tPASS"
                    f"\tAF={af:.3f}\n"
                )
                k += 1
            base += n
    return vcf


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "guide1"
    if mode == "small":
        fa = build_genome(100_000_000, 1)
        run_search(fa, "small_1g", guide=benchmod.GUIDE, guide_id="bench")
    elif mode == "guide1":
        fa = build_genome(3_100_000_000, 8)
        run_search(fa, "hg38_1g", guide=benchmod.GUIDE, guide_id="bench")
    elif mode == "guides4":
        fa = build_genome(3_100_000_000, 8)
        run_search(fa, "hg38_4g", guide_specs=GUIDES4)
    elif mode == "variants":
        from calitas_tpu.tools import prepare_vcf

        fa = build_genome(3_100_000_000, 8)
        raw = make_vcf(fa, 3_000_000)
        prepared = OUT / "prepared.vcf"
        if not prepared.exists():
            prepare_vcf.run(input=[raw], output=prepared,
                            add_chr_prefix=False)
        run_search(
            fa, "hg38_vars", guide=benchmod.GUIDE, guide_id="bench",
            variants=prepared,
        )
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
