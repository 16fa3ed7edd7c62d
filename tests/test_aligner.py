"""SequentialAligner tests, transcribed from the reference's
SequentialGuideAlignerTest.scala — the behavioral parity oracle for the
alignment engine."""

import pytest

from calitas_tpu.core import Guide
from calitas_tpu.core.sequence import revcomp
from calitas_tpu.align.engine import SequentialAligner
from calitas_tpu.io.fasta import IndexedFasta

from tests.fixtures import CHR1, build_aligner_ref


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    path = build_aligner_ref(tmp_path_factory.mktemp("ref"))
    fa = IndexedFasta(path)
    yield fa
    fa.close()


@pytest.fixture(scope="module")
def aligner(ref):
    return SequentialAligner(ref=ref)


def subseq(start: int, end: int) -> str:
    """1-based closed slice of chr1."""
    return CHR1[start - 1 : end]


class TestAlignQueryTarget:
    def test_perfect_pamless_f_strand(self):  # scala :51-65
        query = "AACCAACC"
        target = "TTTTAACCAACCGGGG"
        alns = SequentialAligner().align(
            Guide.parse(query), target,
            max_guide_diffs=0, max_pam_diffs=0,
            max_gaps_between_guide_and_pam=0, max_total_diffs=0,
        )
        assert len(alns) == 1
        a = alns[0]
        assert a.strand == "+"
        assert a.start_offset == 4
        assert a.end_offset == 12
        assert a.guide_start_offset == 4
        assert a.guide_end_offset == 12
        assert str(a.cigar) == "8="
        assert a.padded_guide == "AACCAACC"
        assert a.padded_target == "AACCAACC"

    def test_perfect_pamless_r_strand(self):  # :67-81
        query = "GGTTGGTT"
        target = "TTAACCAACCGGGG"
        alns = SequentialAligner().align(
            Guide.parse(query), target,
            max_guide_diffs=0, max_pam_diffs=0,
            max_gaps_between_guide_and_pam=0, max_total_diffs=0,
        )
        assert len(alns) == 1
        a = alns[0]
        assert a.strand == "-"
        assert a.start_offset == 2
        assert a.end_offset == 10
        assert a.guide_start_offset == 2
        assert a.guide_end_offset == 10
        assert str(a.cigar) == "8="
        assert a.padded_guide == "GGTTGGTT"
        assert a.padded_target == "GGTTGGTT"

    def test_r_strand_with_mismatch(self):  # :83-97
        alns = SequentialAligner().align(
            Guide.parse("GGTTGGTT"), "AGCCAACC",
            max_guide_diffs=1, max_pam_diffs=0,
            max_gaps_between_guide_and_pam=0, max_total_diffs=1,
        )
        assert len(alns) == 1
        a = alns[0]
        assert a.strand == "-"
        assert a.start_offset == 0
        assert a.end_offset == 8
        assert str(a.cigar) == "6=1X1="
        assert a.padded_guide == "GGTTGGTT"
        assert a.padded_target == "GGTTGGCT"

    def test_pam_3prime_f_strand(self):  # :99-112
        alns = SequentialAligner().align(
            Guide.parse("AACCAACCAACCnrg"), "CCAACCAACCAACCGAGGGGGG",
            max_guide_diffs=0, max_pam_diffs=0,
            max_gaps_between_guide_and_pam=1, max_total_diffs=1,
        )
        assert len(alns) == 1
        a = alns[0]
        assert a.strand == "+"
        assert a.start_offset == 2
        assert a.end_offset == 17
        assert a.guide_start_offset == 2
        assert a.guide_end_offset == 14
        assert str(a.cigar) == "15="
        assert a.padded_guide == "AACCAACCAACCnrg"
        assert a.padded_target == "AACCAACCAACCGAG"

    def test_pam_3prime_r_strand(self):  # :114-127
        alns = SequentialAligner().align(
            Guide.parse("AACCAACCAACCnrg"), "CCCTGGGTTGGTTGGTTGGGGGG",
            max_guide_diffs=0, max_pam_diffs=0,
            max_gaps_between_guide_and_pam=1, max_total_diffs=1,
        )
        assert len(alns) == 1
        a = alns[0]
        assert a.strand == "-"
        assert a.start_offset == 2
        assert a.end_offset == 17
        assert a.guide_start_offset == 5
        assert a.guide_end_offset == 17
        assert str(a.cigar) == "15="
        assert a.padded_guide == "AACCAACCAACCnrg"
        assert a.padded_target == "AACCAACCAACCCAG"

    def test_pam_5prime_f_strand(self):  # :129-142
        alns = SequentialAligner().align(
            Guide.parse("tttvAACCAACCAACC"), "CCTTTGAACCAACCAACCGAGG",
            max_guide_diffs=0, max_pam_diffs=0,
            max_gaps_between_guide_and_pam=1, max_total_diffs=1,
        )
        assert len(alns) == 1
        a = alns[0]
        assert a.strand == "+"
        assert a.start_offset == 2
        assert a.end_offset == 18
        assert a.guide_start_offset == 6
        assert a.guide_end_offset == 18
        assert str(a.cigar) == "16="
        assert a.padded_guide == "tttvAACCAACCAACC"
        assert a.padded_target == "TTTGAACCAACCAACC"

    def test_pam_5prime_r_strand(self):  # :144-157
        query = "tttvAACCAACCAACC"
        target = "CC" + revcomp(query.replace("tttv", "TTTG")) + "GAGG"
        alns = SequentialAligner().align(
            Guide.parse(query), target,
            max_guide_diffs=0, max_pam_diffs=0,
            max_gaps_between_guide_and_pam=1, max_total_diffs=1,
        )
        assert len(alns) == 1
        a = alns[0]
        assert a.strand == "-"
        assert a.start_offset == 2
        assert a.end_offset == 18
        assert a.guide_start_offset == 2
        assert a.guide_end_offset == 14
        assert str(a.cigar) == "16="
        assert a.padded_guide == "tttvAACCAACCAACC"
        assert a.padded_target == "TTTGAACCAACCAACC"

    def test_pam_5prime_f_strand_with_mismatch(self):  # :159-172
        alns = SequentialAligner().align(
            Guide.parse("tttvAACCAACCAACC"), "CCTTTGAACCAACCAAGCGAGG",
            max_guide_diffs=1, max_pam_diffs=0,
            max_gaps_between_guide_and_pam=0, max_total_diffs=1,
        )
        assert len(alns) == 1
        a = alns[0]
        assert a.strand == "+"
        assert a.start_offset == 2
        assert a.end_offset == 18
        assert a.guide_start_offset == 6
        assert a.guide_end_offset == 18
        assert str(a.cigar) == "14=1X1="
        assert a.padded_guide == "tttvAACCAACCAACC"
        assert a.padded_target == "TTTGAACCAACCAAGC"

    def test_pam_5prime_r_strand_with_mismatch(self):  # :174-187
        target = "CC" + revcomp("TTTGAACCAACCAAGC") + "GAGG"
        alns = SequentialAligner().align(
            Guide.parse("tttvAACCAACCAACC"), target,
            max_guide_diffs=1, max_pam_diffs=0,
            max_gaps_between_guide_and_pam=0, max_total_diffs=1,
        )
        assert len(alns) == 1
        a = alns[0]
        assert a.strand == "-"
        assert a.start_offset == 2
        assert a.end_offset == 18
        assert a.guide_start_offset == 2
        assert a.guide_end_offset == 14
        assert str(a.cigar) == "14=1X1="
        assert a.padded_guide == "tttvAACCAACCAACC"
        assert a.padded_target == "TTTGAACCAACCAAGC"

    def test_respects_target_offset(self):  # :189-220
        guide1, guide2 = "gggTTTTT", "TTTTTggg"
        target1 = "AGAGAGAGAGGGTTTTTGGGAGAGAGAGAGAGAG"
        target2 = "AGAGAGAGACCCAAAAACCCAGAGAGAGAGAGAG"
        al = SequentialAligner()

        def first(g, t):
            return al.align(
                Guide.parse(g), t,
                max_guide_diffs=0, max_pam_diffs=0,
                max_gaps_between_guide_and_pam=0, max_total_diffs=0,
                target_offset=1000,
            )[0]

        r1 = first(guide1, target1)
        assert (r1.start_offset, r1.end_offset) == (1009, 1017)
        assert (r1.guide_start_offset, r1.guide_end_offset) == (1012, 1017)

        r2 = first(guide2, target1)
        assert (r2.start_offset, r2.end_offset) == (1012, 1020)

        r3 = first(guide1, target2)
        assert (r3.start_offset, r3.end_offset) == (1012, 1020)

        r4 = first(guide2, target2)
        assert (r4.start_offset, r4.end_offset) == (1009, 1017)

    def test_rc_score_symmetry(self, aligner):  # :222-233
        query = "AATTCcgg"
        for target in ["AATTCCGG", "AGTTCCGG", "AAATTCCGG", "AATTCCGAG", "AATTCCTG"]:
            f = aligner.align_best(Guide.parse(query), target)
            r = aligner.align_best(Guide.parse(revcomp(query)), revcomp(target))
            assert r.score == f.score
            assert r.guide_mismatches == f.guide_mismatches
            assert r.guide_gap_bases == f.guide_gap_bases
            assert r.pam_mismatches == f.pam_mismatches
            assert r.pam_gap_bases == f.pam_gap_bases

    def test_penalize_n_in_reference(self, aligner):  # :235-240
        result = aligner.align_best(Guide.parse("AACCGGTTnrg"), "nnnnnnnnnnn")
        s = aligner.scorer
        assert result.score == 8 * s.mismatch_score + 3 * s.pam_mismatch_score

    def test_max_guide_diffs_with_indels(self, aligner):  # :242-248
        query = "yttnAGGAAACTTCTGGCAGGACC"
        target = "GTTAGTTCCAGATCTTGAGGAAGCTATCCCAGGACCCTGTCGCCACAGCCA"
        results = aligner.align(
            Guide.parse(query), target,
            max_guide_diffs=5, max_gaps_between_guide_and_pam=1,
            max_pam_diffs=1, max_total_diffs=7, max_overlap=10,
        )
        assert len(results) == 1
        assert results[0].start_offset == 13

    def test_multi_pam_best_selected(self, aligner):  # :250-256
        query = Guide.parse("AACCGGTTACGTnrg", aux_pams=["ntg"])
        result = aligner.align_best(query, "AACCGGTTACGTTTG")
        assert result.guide == "AACCGGTTACGTntg"
        assert result.pam_mms_plus_gaps == 0

    def test_prefer_longer_pam_on_tie(self, aligner):  # :258-263
        query = Guide.parse("AACCGGTTACGTnnn", aux_pams=["nnnn", "nn"])
        result = aligner.align_best(query, "AACCGGTTACGTAAAAAAA")
        assert result.guide == "AACCGGTTACGTnnnn"

    def test_prefer_longer_pam_with_gap(self, aligner):  # :265-271
        query = Guide.parse("AACCGGTTACGTacc", aux_pams=["cccc"])
        result = aligner.align_best(query, "AACCGGTTACGTACCCC")
        assert result.guide == "AACCGGTTACGTcccc"
        assert str(result.cigar) == "12=1D4="


class TestAlignToRef:
    def test_perfect_f_strand(self, aligner):  # :274-285
        query = subseq(50, 69)
        result = aligner.align_to_ref_best(Guide.parse(query), "chr1", 65)
        assert result.chrom == "chr1"
        assert result.start_offset == 49
        assert result.end_offset == 69
        assert result.strand == "+"
        assert result.padded_guide == result.padded_target
        assert all(c == "|" for c in result.padded_alignment)
        assert result.score >= 0

    def test_u_same_as_t(self, aligner):  # :287-296
        t_query = subseq(50, 69)
        u_query = t_query.replace("T", "U")
        assert u_query != t_query
        t_result = aligner.align_to_ref_best(Guide.parse(t_query), "chr1", 65)
        u_result = aligner.align_to_ref_best(Guide.parse(u_query), "chr1", 65)
        assert u_result.score == t_result.score
        assert u_result.padded_alignment == t_result.padded_alignment

    def test_perfect_r_strand(self, aligner):  # :298-308
        query = revcomp(subseq(50, 69))
        result = aligner.align_to_ref_best(Guide.parse(query), "chr1", 65)
        assert result.chrom == "chr1"
        assert result.start_offset == 49
        assert result.end_offset == 69
        assert result.strand == "-"
        assert all(c == "|" for c in result.padded_alignment)
        assert result.score >= 0

    def test_mismatch_f_strand(self, aligner):  # :310-321
        query = "GAGAATTGtTTGAACCCAGGnGG"
        aligns = "||||||||.||||||||||||||"
        result = aligner.align_to_ref_best(Guide.parse(query.upper()), "chr1", 515)
        assert result.chrom == "chr1"
        assert result.start_offset == 500
        assert result.end_offset == 523
        assert result.strand == "+"
        assert result.padded_alignment == aligns
        assert result.mismatches == 1

    def test_ambiguity_codes_in_pam(self, aligner):  # :323-337
        query = "TCAGTGCCTGCGCCGCGCTCGCTCCCnrycwshdm"
        aligns = "||||||||||||||||||||||||||||||.||||"
        result = aligner.align_to_ref_best(Guide.parse(query), "chr1", 1820)
        assert result.chrom == "chr1"
        assert result.start_offset == 1800
        assert result.end_offset == 1835
        assert result.guide_start_offset == 1800
        assert result.guide_end_offset == 1826
        assert result.strand == "+"
        assert result.padded_alignment == aligns
        assert result.mismatches == 1

    def test_two_bulges_r_strand(self, aligner):  # :339-349
        query = "AGGCTGG-GGCGGTCGCtCGCNGG"
        aligns = "|||||||~|||||||||~||||||"
        clean = "".join(c for c in query if c.isalpha()).upper()
        result = aligner.align_to_ref_best(Guide.parse(clean), "chr1", 1510)
        assert result.chrom == "chr1"
        assert result.start_offset == 1500
        assert result.end_offset == 1523
        assert result.strand == "-"
        assert result.padded_alignment == aligns

    def test_prefer_two_guide_mm_over_one_pam_mm(self, aligner):  # :351-359
        result = aligner.align_to_ref_best(
            Guide.parse("GATACGTCTCGTACTGTnrg"), "chr2", 22
        )
        assert result.chrom == "chr2"
        assert result.start_offset == 0
        assert result.end_offset == 20
        assert result.gap_bases == 0
        assert result.mismatches == 2

    def test_prefer_mismatch_over_genome_bulge(self, aligner):  # :361-368
        query = "GATACGTCTCGTACTGTnrg"
        target = (
            query.replace("GATA", "GATT").replace("nrg", "AAG")
            + "TTTTT"
            + query.replace("TCTC", "TCTCC").replace("nrg", "AAG")
        )
        result = aligner.align_best(Guide.parse(query), target)
        assert result.start_offset == 0
        assert result.mismatches == 1
        assert result.gap_bases == 0

    def test_prefer_genome_bulge_over_guide_bulge(self, aligner):  # :370-377
        query = "GATACGTCTCGTACTGTnrg"
        target = (
            query.replace("TCTC", "TCTCC").replace("nrg", "AAG")
            + "NNNNN"
            + query.replace("TCTC", "TCT").replace("nrg", "AAG")
        )
        result = aligner.align_best(Guide.parse(query), target)
        assert result.start_offset == 0
        assert result.mismatches == 0
        assert result.gap_bases == 1

    def test_max_total_diffs_enforced_separately(self, aligner):  # :379-389
        query = "GATACGTCTCGTACTGTnrg"
        target1 = "GAaACGTtTCGTACTGTaac".upper()
        guide = Guide.parse(query)
        r1 = aligner.align(
            guide, target1,
            max_guide_diffs=2, max_gaps_between_guide_and_pam=0,
            max_pam_diffs=1, max_total_diffs=3,
        )
        assert len(r1) == 1
        r2 = aligner.align(
            guide, target1,
            max_guide_diffs=2, max_gaps_between_guide_and_pam=0,
            max_pam_diffs=1, max_total_diffs=2,
        )
        assert len(r2) == 0
