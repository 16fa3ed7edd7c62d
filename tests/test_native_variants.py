"""Differential fuzz: the native variant-window builder
(native/variants.cpp) must emit windows bit-identical to the pure-Python
machinery in search/variants.py (which transcribes
SearchReference.scala:217-399)."""

from __future__ import annotations

import numpy as np
import pytest

from calitas_tpu import native
from calitas_tpu.io.fasta import IndexedFasta, ReferenceSetBuilder
from calitas_tpu.io.vcf import VcfIndex
from calitas_tpu.search import variants as V

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="no native library"
)


def _make_ref(tmp_path, rng, contigs):
    b = ReferenceSetBuilder(assembly="fuzz")
    seqs = {}
    for name, n in contigs:
        seq = "".join(rng.choice(list("ACGT"), n))
        seqs[name] = seq
        b.add(name).add(seq)
    return IndexedFasta(b.to_file(tmp_path / "ref.fa")), seqs


def _rand_vcf(path, rng, seqs, n_per_contig, cluster_prob=0.3):
    """Random VCF with SNPs, insertions, deletions, complex subs,
    multi-alt records, '.' alts, missing ids/AFs, and dense clusters."""
    lines = []
    for name, seq in seqs.items():
        pos = 50
        made = 0
        while made < n_per_contig and pos < len(seq) - 60:
            if rng.random() < cluster_prob:
                pos += int(rng.integers(1, 12))  # dense: likely same cluster
            else:
                pos += int(rng.integers(40, 140))
            if pos >= len(seq) - 60:
                break
            ref = seq[pos - 1]
            kind = rng.integers(0, 6)
            if kind == 0:  # SNP
                alts = [rng.choice([c for c in "ACGT" if c != ref])]
            elif kind == 1:  # insertion
                ins = "".join(rng.choice(list("ACGT"), int(rng.integers(1, 5))))
                alts = [ref + ins]
            elif kind == 2:  # deletion
                dlen = int(rng.integers(1, 5))
                ref = seq[pos - 1 : pos - 1 + dlen + 1]
                alts = [ref[0]]
            elif kind == 3:  # complex substitution
                rlen = int(rng.integers(2, 5))
                ref = seq[pos - 1 : pos - 1 + rlen]
                alts = ["".join(rng.choice(list("ACGT"), int(rng.integers(2, 6))))]
            elif kind == 4:  # multi-alt SNP
                others = [c for c in "ACGT" if c != ref]
                k = int(rng.integers(2, 4))
                alts = list(rng.choice(others, k, replace=False))
            else:  # '.' alt only (no usable alleles)
                alts = ["."]
            vid = f"rs{pos}" if rng.random() < 0.7 else "."
            if rng.random() < 0.8:
                afs = ",".join(
                    f"{rng.random():.4f}" for _ in alts if _ != "."
                )
                info = f"AF={afs}" if afs else "."
            else:
                info = "."
            alt_field = ",".join(alts)
            lines.append(f"{name}\t{pos}\t{vid}\t{ref}\t{alt_field}\t.\tPASS\t{info}")
            made += 1
            pos += len(ref)
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##INFO=<ID=AF,Number=A,Type=Float,Description="AF">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for line in lines:
            fh.write(line + "\n")
    return path


def _assert_same_windows(nat, pyw):
    assert len(nat) == len(pyw)
    for a, b in zip(nat, pyw):
        assert a.chrom == b.chrom
        assert a.start == b.start
        assert a.bases.tobytes() == b.bases.tobytes()
        assert str(a.cigar) == str(b.cigar)
        assert a.variants == b.variants
        assert a.length == b.length


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_fuzz_native_vs_python(tmp_path, seed):
    rng = np.random.default_rng(seed)
    fasta, seqs = _make_ref(
        tmp_path, rng, [("chr1", 4000), ("chr2", 3000), ("chrX", 2500)]
    )
    vcf = _rand_vcf(tmp_path / "v.vcf", rng, seqs, n_per_contig=40)
    idx = VcfIndex(vcf)
    padding = int(rng.integers(10, 40))
    lib = native.get_lib()
    nat = list(
        V._native_variant_window_iter(lib, fasta, idx, None, padding, 16)
    )
    pyw = list(V.variant_window_iterator(fasta, vcf, None, padding, 16))
    assert nat, "fuzz produced no windows"
    _assert_same_windows(nat, pyw)


def test_chrom_restriction_and_index_dispatch(tmp_path):
    rng = np.random.default_rng(7)
    fasta, seqs = _make_ref(tmp_path, rng, [("chr1", 3000), ("chr2", 3000)])
    vcf = _rand_vcf(tmp_path / "v.vcf", rng, seqs, n_per_contig=25)
    idx = VcfIndex(vcf)
    # The index path dispatches to the native builder (sorted per chrom).
    nat = list(V.variant_window_iterator(fasta, idx, "chr2", 20, 16))
    pyw = list(V.variant_window_iterator(fasta, vcf, "chr2", 20, 16))
    assert all(w.chrom == "chr2" for w in nat)
    _assert_same_windows(nat, pyw)
    assert isinstance(nat[0], V._LazyVariantWindow)


def test_block_boundary_chunk_continuation(tmp_path, monkeypatch):
    """Chunks that straddle a native block boundary are re-presented in
    the next call; tiny blocks must not change the output."""
    rng = np.random.default_rng(11)
    fasta, seqs = _make_ref(tmp_path, rng, [("chr1", 6000)])
    vcf = _rand_vcf(tmp_path / "v.vcf", rng, seqs, n_per_contig=80,
                    cluster_prob=0.6)
    idx = VcfIndex(vcf)
    big = list(V.variant_window_iterator(fasta, idx, None, 30, 16))
    monkeypatch.setattr(V, "_NATIVE_BLOCK", 3)
    small = list(V.variant_window_iterator(fasta, idx, None, 30, 16))
    _assert_same_windows(small, big)


def test_max_variants_fallback_and_warning(tmp_path, caplog):
    """Oversized clusters fall back to first-variant-only sets with the
    reference's warning, identically in both builders."""
    import logging

    rng = np.random.default_rng(13)
    fasta, seqs = _make_ref(tmp_path, rng, [("chr1", 3000)])
    seq = seqs["chr1"]
    with open(tmp_path / "v.vcf", "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for k in range(6):  # 6 SNPs 5bp apart: one chunk, max_variants=3
            pos = 500 + 5 * k
            ref = seq[pos - 1]
            alt = "ACGT"[("ACGT".index(ref) + 1) % 4]
            fh.write(f"chr1\t{pos}\trs{k}\t{ref}\t{alt}\t.\tPASS\tAF=0.1\n")
    idx = VcfIndex(tmp_path / "v.vcf")
    with caplog.at_level(logging.WARNING, logger="calitas_tpu.variants"):
        nat = list(V.variant_window_iterator(fasta, idx, None, 20, 3))
    nat_warnings = [r.getMessage() for r in caplog.records
                    if "Not checking combos" in r.getMessage()]
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="calitas_tpu.variants"):
        pyw = list(V.variant_window_iterator(fasta, tmp_path / "v.vcf",
                                             None, 20, 3))
    py_warnings = [r.getMessage() for r in caplog.records
                   if "Not checking combos" in r.getMessage()]
    _assert_same_windows(nat, pyw)
    assert nat_warnings and sorted(nat_warnings) == sorted(py_warnings)


def test_missing_lib_falls_back_to_python(tmp_path, monkeypatch):
    """Without the native library the index path uses the Python
    machinery and produces the same windows."""
    rng = np.random.default_rng(17)
    fasta, seqs = _make_ref(tmp_path, rng, [("chr1", 3000)])
    vcf = _rand_vcf(tmp_path / "v.vcf", rng, seqs, n_per_contig=20)
    idx = VcfIndex(vcf)
    nat = list(V.variant_window_iterator(fasta, idx, None, 20, 16))
    monkeypatch.setattr(native, "get_lib", lambda: None)
    wins = list(V.variant_window_iterator(fasta, idx, None, 20, 16))
    assert not any(isinstance(w, V._LazyVariantWindow) for w in wins)
    _assert_same_windows(nat, wins)


def test_unsorted_chrom_sorted_before_windowing(tmp_path):
    """A position-unsorted chromosome must not take the native builder
    (its right-to-left splice needs sorted input); the Python fallback
    position-sorts the stream, so windows come out exactly as if the
    VCF had been sorted (the reference's htsjdk source guarantees
    sortedness; our tolerant reader must not feed file order into the
    order-dependent chunking)."""
    rng = np.random.default_rng(18)
    fasta, seqs = _make_ref(tmp_path, rng, [("chr1", 2000)])
    seq = seqs["chr1"]

    def write_vcf(path, positions):
        with open(path, "w") as fh:
            fh.write("##fileformat=VCFv4.2\n")
            fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
            for pos in positions:
                ref = seq[pos - 1]
                alt = "ACGT"[("ACGT".index(ref) + 1) % 4]
                fh.write(
                    f"chr1\t{pos}\trs{pos}\t{ref}\t{alt}\t.\tPASS\tAF=0.1\n"
                )

    write_vcf(tmp_path / "v.vcf", (900, 300))  # unsorted
    write_vcf(tmp_path / "sorted.vcf", (300, 900))
    idx = VcfIndex(tmp_path / "v.vcf")
    assert not idx._sorted["chr1"]

    def windows(src):
        return [
            (w.chrom, w.start, bytes(w.bases))
            for w in V.variant_window_iterator(fasta, src, None, 20, 16)
        ]

    want = windows(VcfIndex(tmp_path / "sorted.vcf"))
    assert len(want) == 2
    assert windows(idx) == want  # unsorted index path
    assert windows(tmp_path / "v.vcf") == want  # unsorted streaming path


def test_missing_chrom_error_parity(tmp_path):
    rng = np.random.default_rng(19)
    fasta, seqs = _make_ref(tmp_path, rng, [("chr1", 2000)])
    with open(tmp_path / "v.vcf", "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write("chr1\t500\t.\tA\tT\t.\tPASS\t.\n")
        fh.write("chr9\t500\t.\tA\tT\t.\tPASS\t.\n")
    idx = VcfIndex(tmp_path / "v.vcf")
    with pytest.raises(ValueError, match="chr9"):
        list(V.variant_window_iterator(fasta, idx, None, 20, 16))
    with pytest.raises(ValueError, match="chr9"):
        list(V.variant_window_iterator(fasta, tmp_path / "v.vcf", None, 20, 16))


def test_search_reference_table_identical_with_native_builder(tmp_path):
    """End-to-end: the full SearchReference variant pass produces a
    row-identical table whether windows come from the native builder
    (VcfIndex path, default) or the Python iterator (path input)."""
    from calitas_tpu.tools import search_reference

    rng = np.random.default_rng(23)
    guide = "CTTGCCCCACAGGGCAGTAAnrg"
    fasta, seqs = _make_ref(tmp_path, rng, [("chr1", 30000)])
    seq = seqs["chr1"]
    # Plant a near-hit whose missing match is restored by a SNP.
    core = "CTTGCCCCACAGGGCAGTAA"
    planted = core[:10] + "T" + core[11:] + "TGG"
    pos0 = 12000
    b = ReferenceSetBuilder(assembly="fuzz")
    seq2 = seq[:pos0] + planted + seq[pos0 + len(planted):]
    b.add("chr1").add(seq2)
    fasta2 = IndexedFasta(b.to_file(tmp_path / "ref2.fa"))
    with open(tmp_path / "v.vcf", "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write('##INFO=<ID=AF,Number=A,Type=Float,Description="AF">\n')
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        snp_pos = pos0 + 11  # 1-based position of the planted 'T'
        for pos in (2000, 2010, 9000):
            ref = seq2[pos - 1]
            alt = "ACGT"[("ACGT".index(ref) + 1) % 4]
            fh.write(f"chr1\t{pos}\trs{pos}\t{ref}\t{alt}\t.\tPASS\tAF=0.2\n")
        fh.write(f"chr1\t{snp_pos}\trsfix\tT\t{core[10]}\t.\tPASS\tAF=0.4\n")

    out_native = tmp_path / "out_native.tsv"
    search_reference.run(
        guide=guide, guide_id="g", ref=fasta2.path,
        variants=tmp_path / "v.vcf", output=out_native, engine="host",
        threads=1,
    )
    # Force the Python builder by monkey-free means: mark the chrom
    # unsorted on a fresh index and inject it via the variants kwarg.
    idx = VcfIndex(tmp_path / "v.vcf")
    idx._sorted["chr1"] = False
    out_py = tmp_path / "out_py.tsv"
    search_reference.run(
        guide=guide, guide_id="g", ref=fasta2.path,
        variants=tmp_path / "v.vcf", output=out_py, engine="host",
        threads=1, _vcf_index=idx,
    )
    a = out_native.read_text().splitlines()
    b2 = out_py.read_text().splitlines()
    assert len(a) == len(b2) and len(a) > 1
    # variant rows must be present
    assert any("rsfix" in line for line in a)
    for la, lb in zip(a, b2):
        assert la == lb


@pytest.mark.parametrize("seed", [5, 6])
def test_blocks_mode_screens_identically(tmp_path, seed):
    """The raw-block screened path (mask rows packed straight from the
    builder buffers, windows materialized only when flagged) must yield
    the same (window, keys) stream as the plain-window path."""
    from calitas_tpu.align.engine import SequentialAligner
    from calitas_tpu.core.guide import Guide
    from calitas_tpu.search.variants import screened_variant_windows_multi

    rng = np.random.default_rng(seed)
    fasta, seqs = _make_ref(tmp_path, rng, [("chr1", 4000), ("chr2", 3000)])
    vcf = _rand_vcf(tmp_path / "v.vcf", rng, seqs, n_per_contig=60)
    idx = VcfIndex(vcf)
    padding = 30
    aligner = SequentialAligner()
    # Thresholds spanning all/some/none flagged, mixed guide lengths.
    specs = [
        ("lo", Guide.parse("ACGTACGTACGTACGTACGTnrg"), -(10**9)),
        ("mid", Guide.parse("TTGAGCCACAGGTTTACAGGnrg"),
         aligner.min_guide_score(
             Guide.parse("TTGAGCCACAGGTTTACAGGnrg"), 5)),
        ("hi", Guide.parse("GATTACAGATTACAGATTACATnrg"), 10**9),
    ]

    def stream(blocks):
        it = V.variant_window_iterator(
            fasta, idx, None, padding, 16, blocks=blocks
        )
        out = []
        for w, keys in screened_variant_windows_multi(
            it, aligner, specs, batch_slots=64
        ):
            out.append(
                (w.chrom, w.start, w.bases.tobytes(), str(w.cigar),
                 w.variants, frozenset(keys))
            )
        return out

    a = stream(False)
    b = stream(True)
    assert a, "no windows flagged at the permissive threshold"
    assert a == b


def test_trailing_comma_alt_parity(tmp_path):
    """'.' and empty ALT tokens (malformed trailing/leading commas)
    carry no allele; BOTH parsers drop them so the two tiers emit the
    same window set (the old native tokenizer dropped only the trailing
    one, diverging from Python)."""
    rng = np.random.default_rng(23)
    fasta, seqs = _make_ref(tmp_path, rng, [("chr1", 2000)])
    seq = seqs["chr1"]
    with open(tmp_path / "v.vcf", "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write(f"chr1\t500\trs1\t{seq[499]}\tC,\t.\tPASS\tAF=0.1,0.1\n")
        fh.write(f"chr1\t900\trs2\t{seq[899]}\t,C\t.\tPASS\tAF=0.1,0.1\n")
    idx = VcfIndex(tmp_path / "v.vcf")

    def windows(src):
        return [
            (w.chrom, w.start, bytes(w.bases))
            for w in V.variant_window_iterator(fasta, src, None, 20, 16)
        ]

    nat = windows(idx)  # native builder (sorted chrom)
    py = windows(tmp_path / "v.vcf")  # streaming python fallback
    assert nat == py
    assert len(nat) == 2  # one real alt per record (empties dropped)


def test_variant_beyond_contig_raises_loudly(tmp_path):
    """A variant past the contig end (mismatched VCF/reference builds)
    must raise a clear ValueError on BOTH tiers, never silently drop
    windows."""
    rng = np.random.default_rng(24)
    fasta, seqs = _make_ref(tmp_path, rng, [("chr1", 200)])
    with open(tmp_path / "v.vcf", "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write("chr1\t500\trs1\tA\tC\t.\tPASS\tAF=0.1\n")
    for src in (VcfIndex(tmp_path / "v.vcf"), tmp_path / "v.vcf"):
        with pytest.raises(ValueError, match="genome build"):
            list(V.variant_window_iterator(fasta, src, None, 20, 16))
