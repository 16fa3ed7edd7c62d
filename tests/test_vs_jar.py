"""JAR-differential tests: when a reference CALITAS CLI is available
(CALITAS_JAR / CALITAS_CMD / bioconda `calitas`), every tool's table
must match it row-for-row modulo time_stamp/aligner_version
(BASELINE.md protocol).  Skipped in JVM-less environments; the
transcribed reference test suite + golden tables stand in there.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
spec = importlib.util.spec_from_file_location("vs_jar", ROOT / "benchmarks" / "vs_jar.py")
vs_jar = importlib.util.module_from_spec(spec)
spec.loader.exec_module(vs_jar)

pytestmark = pytest.mark.skipif(
    vs_jar.reference_cmd() is None,
    reason="no reference CALITAS CLI (set CALITAS_JAR or install calitas)",
)


@pytest.fixture()
def small_ref(tmp_path):
    from calitas_tpu.core.sequence import revcomp
    from calitas_tpu.io.fasta import ReferenceSetBuilder

    rng = np.random.default_rng(17)
    proto = "CTTGCCCCACAGGGCAGTAA"
    seq = list("".join(rng.choice(list("ACGT"), 200_000)))
    for k in range(10):
        pos = 5_000 + 18_000 * k
        site = list(proto)
        for _ in range(k % 4):
            i = int(rng.integers(0, 20))
            site[i] = rng.choice([c for c in "ACGT" if c != site[i]])
        s = "".join(site) + "TGG"
        if k % 2:
            s = revcomp(s)
        seq[pos : pos + len(s)] = list(s)
    b = ReferenceSetBuilder(assembly="vsjar")
    b.add("chr1").add("".join(seq))
    return b.to_file(tmp_path / "ref.fa")


def test_search_reference_matches_jar(small_ref):
    rc = vs_jar.run_differential(
        "SearchReference",
        ["-i", "CTTGCCCCACAGGGCAGTAAnrg", "-I", "g", "-r", str(small_ref),
         "-d", "4", "-p", "1"],
    )
    assert rc == 0


def test_pairwise_matches_jar(tmp_path):
    from calitas_tpu.core.sequence import revcomp

    rng = np.random.default_rng(23)
    proto = "CTTGCCCCACAGGGCAGTAA"
    inp = tmp_path / "pairs.txt"
    with open(inp, "w") as fh:
        for i in range(25):
            t = list("".join(rng.choice(list("ACGT"), 60)))
            site = proto + "TGG"
            if i % 2:
                site = revcomp(site)
            t[10 : 10 + len(site)] = list(site)
            fh.write(f"{proto}nrg\t{''.join(t)}\n")
    rc = vs_jar.run_differential("PairwiseAlignSequences", ["-i", str(inp)])
    assert rc == 0


def _write_raw_vcf(path, rows):
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##INFO=<ID=AF,Number=A,Type=Float,Description="AF">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for chrom, pos, vid, ref, alt, af in rows:
            fh.write(f"{chrom}\t{pos}\t{vid}\t{ref}\t{alt}\t50\tPASS\tAF={af}\n")
    return path


def test_search_reference_with_fractional_afs_matches_jar(small_ref, tmp_path):
    """Variant-annotated rows with non-float32-exact AFs: pins the
    Float->Double widening fix (VERDICT r2 missing #1) against the JAR —
    allele_frequency must render e.g. 0.13500000536441803."""
    vcf = _write_raw_vcf(
        tmp_path / "v.vcf",
        [
            ("chr1", 5_004, "rsA", "C", "A", "0.135"),
            ("chr1", 23_010, "rsB", "A", "T", "0.3"),
            ("chr1", 41_005, "rsC", "G", "C", "0.041"),
        ],
    )
    rc = vs_jar.run_differential(
        "SearchReference",
        ["-i", "CTTGCCCCACAGGGCAGTAAnrg", "-I", "g", "-r", str(small_ref),
         "-v", str(vcf), "-d", "4", "-p", "1"],
    )
    assert rc == 0


def test_prepare_vcf_matches_jar(tmp_path):
    """PrepareVcf record-line parity (VERDICT r2 item 7): AF threshold
    (float32-widened compare) and AF respelling (Float.toString) must
    match the JAR byte-for-byte on the record lines — the prepared file
    feeds the variant_vcf MD5 column downstream."""
    import subprocess

    raw = _write_raw_vcf(
        tmp_path / "raw.vcf",
        [
            ("1", 100, "edge", "A", "C", "0.01"),       # dropped: f32 < 0.01
            ("1", 200, "above", "A", "C", "0.0100001"),
            ("1", 300, "padded", "A", "C", "0.1350"),   # respells to 0.135
            ("1", 400, "multi", "A", "C,G", "0.5,0.001"),
            ("1", 500, "sci", "A", "C", "0.25"),
        ],
    )
    ours = tmp_path / "ours.vcf"
    theirs = tmp_path / "theirs.vcf"
    subprocess.run(
        [sys.executable, "-m", "calitas_tpu", "PrepareVcf",
         "-i", str(raw), "-o", str(ours)],
        check=True,
    )
    subprocess.run(
        [*vs_jar.reference_cmd(), "PrepareVcf", "-i", str(raw),
         "-o", str(theirs)],
        check=True,
    )
    recs = lambda p: [l for l in Path(p).read_text().splitlines()
                      if l and not l.startswith("#")]
    assert recs(ours) == recs(theirs)
