"""Run the five BASELINE.json benchmark configurations on synthetic data.

The reference publishes no numbers (BASELINE.md), so these configs are
self-measured: each produces (a) a wall-clock + throughput line and (b) a
deterministic output table that doubles as a regression fixture.

Usage: python benchmarks/run_configs.py [config ...]   (default: 1 2 3 4)
Config 5 (multi-host hg38) needs real multi-host hardware; its
single-host shape (multi-guide + mesh-sharded screen) runs as config 5s.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from calitas_tpu.core.sequence import revcomp
from calitas_tpu.io.fasta import ReferenceSetBuilder

GUIDE = "CTTGCCCCACAGGGCAGTAAnrg"
PROTO = "CTTGCCCCACAGGGCAGTAA"
OUT = Path(__file__).resolve().parent / "out"


def synth_genome(n: int, seed: int, plant: int = 40) -> str:
    rng = np.random.default_rng(seed)
    arr = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, n)]
    for _ in range(plant):
        pos = int(rng.integers(100, n - 100))
        site = list(PROTO)
        for _ in range(int(rng.integers(0, 5))):
            i = int(rng.integers(0, len(site)))
            site[i] = rng.choice([c for c in "ACGT" if c != site[i]])
        seq = "".join(site) + rng.choice(["TGG", "AAG", "CGG"])
        if rng.random() < 0.5:
            seq = revcomp(seq)
        arr[pos : pos + len(seq)] = np.frombuffer(seq.encode(), dtype=np.uint8)
    return arr.tobytes().decode("ascii")


def build_ref(n: int, seed: int, name: str) -> Path:
    path = OUT / f"{name}.fa"
    if path.exists():
        return path
    b = ReferenceSetBuilder(assembly=name)
    b.add("chr21").add(synth_genome(n, seed))
    return b.to_file(path)


def timed(label: str, fn, bases: int = 0):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    rate = f" {bases/dt/1e6:.1f} Mbases/s" if bases else ""
    print(f"[{label}] {dt:.2f}s{rate}")


def config1():
    """PairwiseAlignSequences: guide vs ~100 short targets."""
    from calitas_tpu.tools import pairwise

    rng = np.random.default_rng(1)
    inp = OUT / "pairs.txt"
    with open(inp, "w") as fh:
        for _ in range(100):
            t = list("".join(rng.choice(list("ACGT"), 60)))
            pos = int(rng.integers(0, 60 - 24))
            site = list(PROTO + "TGG")
            for _ in range(int(rng.integers(0, 4))):
                i = int(rng.integers(0, len(site)))
                site[i] = rng.choice(list("ACGT"))
            t[pos : pos + len(site)] = site
            fh.write(f"{GUIDE}\t{''.join(t)}\n")
    timed("config1 Pairwise x100", lambda: pairwise.run(input=inp, output=OUT / "config1.txt"))


def config2():
    """AlignToReference with --window-size 60."""
    from calitas_tpu.tools import align_to_reference

    ref = build_ref(2_000_000, 2, "c2ref")
    rng = np.random.default_rng(2)
    inp = OUT / "loci.txt"
    with open(inp, "w") as fh:
        fh.write("id\tquery\tchrom\tposition\n")
        for i in range(200):
            fh.write(f"{i}\t{GUIDE}\tchr21\t{int(rng.integers(100, 1_999_900))}\n")
    timed(
        "config2 AlignToReference x200 w60",
        lambda: align_to_reference.run(
            input=inp, ref=ref, output=OUT / "config2.txt", window_size=60
        ),
    )


def config3():
    """SearchReference on a chr21-scale contig."""
    from calitas_tpu.tools import search_reference

    n = 40_000_000  # chr21 is ~46 Mb
    ref = build_ref(n, 3, "c3chr21")
    timed(
        "config3 SearchReference chr21-scale",
        lambda: search_reference.run(
            guide=GUIDE, guide_id="bench", ref=ref, output=OUT / "config3.txt",
            max_guide_diffs=5, max_pam_mismatches=1,
        ),
        bases=n,
    )


def config4():
    """SearchReference + PrepareVcf'd variants."""
    from calitas_tpu.tools import prepare_vcf, search_reference

    n = 5_000_000
    ref = build_ref(n, 4, "c4chr21")
    rng = np.random.default_rng(4)
    raw_vcf = OUT / "raw.vcf"
    with open(raw_vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##INFO=<ID=AF,Number=A,Type=Float,Description="AF">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for pos in sorted(rng.integers(1000, n - 1000, size=2000)):
            ref_b = rng.choice(list("ACGT"))
            alt = rng.choice([c for c in "ACGT" if c != ref_b])
            af = float(rng.uniform(0.01, 0.5))
            fh.write(f"chr21\t{pos}\trs{pos}\t{ref_b}\t{alt}\t50\tPASS\tAF={af:.3f}\n")
    prepared = OUT / "prepared.vcf"
    prepare_vcf.run(input=[raw_vcf], output=prepared, add_chr_prefix=False)
    timed(
        "config4 SearchReference+VCF",
        lambda: search_reference.run(
            guide=GUIDE, guide_id="bench", ref=ref, variants=prepared,
            output=OUT / "config4.txt",
        ),
        bases=n,
    )


def config5s():
    """Multi-guide search with the mesh-sharded screen (single host)."""
    from calitas_tpu.tools import search_reference

    n = 10_000_000
    ref = build_ref(n, 5, "c5ref")
    rng = np.random.default_rng(5)
    guides = [("g%d" % i, "".join(rng.choice(list("ACGT"), 20)) + "nrg", ())
              for i in range(4)]
    guides[0] = ("g0", GUIDE, ())
    timed(
        "config5s multi-guide x4",
        lambda: search_reference.run(
            ref=ref, output=OUT / "config5s.txt", guide_specs=guides
        ),
        bases=n * len(guides),
    )


CONFIGS = {"1": config1, "2": config2, "3": config3, "4": config4, "5s": config5s}

if __name__ == "__main__":
    OUT.mkdir(exist_ok=True)
    chosen = sys.argv[1:] or ["1", "2", "3", "4"]
    for c in chosen:
        CONFIGS[c]()
