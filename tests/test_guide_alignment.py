"""GuideAlignment counter tests, transcribed from the reference's
GuideAlignmentTest.scala (behavioral parity oracle)."""

from calitas_tpu.core.cigar import Cigar
from calitas_tpu.align.guide_alignment import GuideAlignment


def letters(s: str) -> str:
    return "".join(c for c in s if c.isalpha())


def make(pq, pa, pt, strand="+", start=1, end=None, cigar="25M"):
    return GuideAlignment.create(
        guide=letters(pq),
        chrom="chr1",
        start_offset=start,
        end_offset=end,
        strand=strand,
        score=100,
        cigar=Cigar(cigar),
        padded_guide=pq,
        padded_alignment=pa,
        padded_target=pt,
    )


class TestGuideAlignmentCounters:
    def test_perfect_alignment(self):  # GuideAlignmentTest.scala:11-28
        aln = make(
            "GCTGACTGCATGACTATAnrg",
            "|||||||||||||||||||||",
            "GCTGACTGCATGACTATAnrg",
            end=21,
        )
        assert aln.guide_mismatches == 0
        assert aln.guide_gap_bases == 0
        assert aln.guide_mms_plus_gaps == 0
        assert aln.pam_mismatches == 0
        assert aln.pam_gap_bases == 0
        assert aln.pam_mms_plus_gaps == 0
        assert aln.mismatches == 0
        assert aln.gap_bases == 0
        assert aln.edits == 0
        assert aln.guide_start_offset == 1
        assert aln.guide_end_offset == 18

    def test_single_bp_gaps_and_mms_in_guide(self):  # :30-47
        aln = make(
            "GCTGACT-GCATGACTATAnrg",
            "||.||||~|||.||~|||||||",
            "GCAGACTCGCACGA-TATAnrg",
            end=21,
            cigar="7M1D6M1I7M",
        )
        assert aln.guide_mismatches == 2
        assert aln.guide_gap_bases == 2
        assert aln.guide_mms_plus_gaps == 4
        assert aln.pam_mismatches == 0
        assert aln.pam_gap_bases == 0
        assert aln.pam_mms_plus_gaps == 0
        assert aln.mismatches == 2
        assert aln.gap_bases == 2
        assert aln.edits == 4
        assert aln.guide_start_offset == 1
        assert aln.guide_end_offset == 18

    def test_single_bp_gaps_and_mms_in_pam(self):  # :49-66
        aln = make(
            "GCTGACTGCATGACTATAnngrrn",
            "|||||||||||||||||||~||.|",
            "GCTGACTGCATGACTATAC-GATT",
            end=23,
            cigar="19M1I4M",
        )
        assert aln.guide_mismatches == 0
        assert aln.guide_gap_bases == 0
        assert aln.guide_mms_plus_gaps == 0
        assert aln.pam_mismatches == 1
        assert aln.pam_gap_bases == 1
        assert aln.pam_mms_plus_gaps == 2
        assert aln.mismatches == 1
        assert aln.gap_bases == 1
        assert aln.edits == 2
        assert aln.guide_start_offset == 1
        assert aln.guide_end_offset == 18

    def test_multi_base_gaps(self):  # :68-85
        aln = make(
            "GCTGAC---TGCATGACTATAnrg",
            "||||||~~~||||~~|||||||||",
            "GCTGACGGGTGCA--ACTATACGG",
            strand="-",
            end=22,
            cigar="6M3D4M2I9M",
        )
        assert aln.guide_mismatches == 0
        assert aln.guide_gap_bases == 5
        assert aln.guide_mms_plus_gaps == 5
        assert aln.pam_mismatches == 0
        assert aln.pam_gap_bases == 0
        assert aln.pam_mms_plus_gaps == 0
        assert aln.mismatches == 0
        assert aln.gap_bases == 5
        assert aln.edits == 5
        assert aln.guide_start_offset == 4
        assert aln.guide_end_offset == 22

    def test_leading_and_trailing_deletions(self):  # :87-104
        aln = make(
            "---GCTGACTGCATGACTATAnrg--",
            "~~~|||||||||||||||||||||~~",
            "TGTGCTGACTGCATGACTATACGGCC",
            end=26,
            cigar="3D21M2D",
        )
        assert aln.guide_mismatches == 0
        assert aln.guide_gap_bases == 3
        assert aln.guide_mms_plus_gaps == 3
        assert aln.pam_mismatches == 0
        assert aln.pam_gap_bases == 2
        assert aln.pam_mms_plus_gaps == 2
        assert aln.mismatches == 0
        assert aln.gap_bases == 5
        assert aln.edits == 5
        assert aln.guide_start_offset == 4
        assert aln.guide_end_offset == 21

    def test_gap_between_guide_and_pam_counts_as_guide(self):  # :106-123
        aln = make(
            "GCTGACTGCATGACTATA--nrg",
            "||||||||||||||||||~~|||",
            "GCTGACTGCATGACTATATTCGG",
            end=23,
            cigar="18M2D3M",
        )
        assert aln.guide_mismatches == 0
        assert aln.guide_gap_bases == 2
        assert aln.guide_mms_plus_gaps == 2
        assert aln.pam_mismatches == 0
        assert aln.pam_gap_bases == 0
        assert aln.pam_mms_plus_gaps == 0
        assert aln.mismatches == 0
        assert aln.gap_bases == 2
        assert aln.edits == 2
        assert aln.guide_start_offset == 1
        assert aln.guide_end_offset == 18
