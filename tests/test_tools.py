"""Tool-level tests: PairwiseAlignSequences, AlignToReference, PrepareVcf
(PrepareVcf case transcribed from the reference's PrepareVcfTest.scala)."""

import pytest

from calitas_tpu.io.fasta import ReferenceSetBuilder
from calitas_tpu.io.tsv import read_metrics
from calitas_tpu.io.vcf import VcfReader
from calitas_tpu.search.hits import ReferenceHit
from calitas_tpu.tools import align_to_reference, pairwise, prepare_vcf

from tests.vcf_util import VcfBuilder
from tests.fixtures import build_aligner_ref, CHR1


class TestPairwise:
    def test_end_to_end(self, tmp_path):
        inp = tmp_path / "pairs.txt"
        inp.write_text(
            "AACCAACC TTTTAACCAACCGGGG\n"
            "CTTGCCCCACAGGGCAGTAAnrg\tTTCTTGCCCCACAGGGCAGTAATGGAA\n"
            "\n"
        )
        out = tmp_path / "out.txt"
        pairwise.run(input=inp, output=out)
        lines = out.read_text().strip().split("\n")
        assert lines[0].split("\t") == pairwise.COLUMNS
        f1 = lines[1].split("\t")
        assert f1[2] == "480"  # 8 * 60
        assert f1[3] == "1"  # query_start hardcoded 1
        assert f1[4] == "4"  # target_start = startOffset
        assert f1[5] == "8="
        f2 = lines[2].split("\t")
        assert f2[2] == "1590"
        assert f2[5] == "23="

    def test_rejects_bad_line(self, tmp_path):
        inp = tmp_path / "pairs.txt"
        inp.write_text("ONLYONEFIELD\n")
        with pytest.raises(ValueError):
            pairwise.run(input=inp, output=tmp_path / "out.txt")


class TestAlignToReference:
    @pytest.fixture(scope="class")
    def ref(self, tmp_path_factory):
        return build_aligner_ref(tmp_path_factory.mktemp("atr"))

    def test_best_mode(self, ref, tmp_path):
        inp = tmp_path / "in.txt"
        query = CHR1[49:69]  # chr1:50-69
        inp.write_text(f"id\tquery\tchrom\tposition\n1\t{query}\tchr1\t65\n")
        out = tmp_path / "out.txt"
        align_to_reference.run(input=inp, ref=ref, output=out, window_size=60)
        hits = read_metrics(out, ReferenceHit)
        assert len(hits) == 1
        h = hits[0]
        assert h.guide_id == "1"
        assert h.coordinate_start == 49
        assert h.coordinate_end == 69
        assert h.strand == "+"
        assert h.aligner == "CALITAS:AlignToReference"

    def test_id_defaults_to_query(self, ref, tmp_path):
        inp = tmp_path / "in.txt"
        query = CHR1[49:69]
        inp.write_text(f"query\tchrom\tposition\n{query}\tchr1\t65\n")
        out = tmp_path / "out.txt"
        align_to_reference.run(input=inp, ref=ref, output=out)
        hits = read_metrics(out, ReferenceHit)
        assert hits[0].guide_id == query

    def test_all_or_none_validation(self, ref, tmp_path):
        inp = tmp_path / "in.txt"
        inp.write_text("query\tchrom\tposition\nACGT\tchr1\t65\n")
        with pytest.raises(ValueError):
            align_to_reference.run(
                input=inp, ref=ref, output=tmp_path / "o.txt", max_guide_diffs=3
            )

    def test_all_hits_mode(self, ref, tmp_path):
        inp = tmp_path / "in.txt"
        query = CHR1[49:69]
        inp.write_text(f"id\tquery\tchrom\tposition\nq\t{query}\tchr1\t65\n")
        out = tmp_path / "out.txt"
        align_to_reference.run(
            input=inp, ref=ref, output=out,
            max_guide_diffs=2, max_pam_mismatches=0, max_overlap=5,
        )
        hits = read_metrics(out, ReferenceHit)
        assert len(hits) >= 1
        assert "max-guide-diffs=Some(2)" in hits[0].aligner_other_parameters


class TestPrepareVcf:
    def test_strips_genotypes(self, tmp_path):  # PrepareVcfTest.scala:9-39
        b = VcfBuilder(samples=["sample1", "sample2"])
        for i in range(10):
            b.add(
                "chr1", 1000 * (i + 1), ".", ["A", "C"],
                info={"AF": "0.5"}, filters=("PASS",),
                gts=("0/1", "./."),
            )
        vcf_in = b.to_file(tmp_path / "in.vcf")
        vcf_out = tmp_path / "prepared.vcf.gz"
        prepare_vcf.run(input=[vcf_in], output=vcf_out)
        src = VcfReader(vcf_out)
        assert src.header.samples == []
        variants = list(src)
        assert len(variants) == 10
        assert all(len(v.genotypes) == 0 for v in variants)

    def test_filters_and_chr_prefix(self, tmp_path):
        b = VcfBuilder()
        b.add("1", 100, "keep", ["A", "C"], info={"AF": "0.5"})
        b.add("1", 200, "lowaf", ["A", "C"], info={"AF": "0.001"})
        b.add("1", 300, "fail", ["A", "C"], info={"AF": "0.5"}, filters=("q10",))
        b.add("GL000194.1", 400, "odd", ["A", "C"], info={"AF": "0.5"})
        vcf_in = b.to_file(tmp_path / "in.vcf")
        out = tmp_path / "out.vcf"
        prepare_vcf.run(input=[vcf_in], output=out)
        vs = list(VcfReader(out))
        assert [v.chrom for v in vs] == ["chr1", "GL000194.1"]
        assert [v.id for v in vs] == ["keep", "odd"]

    def test_af_spelling_and_float32_threshold(self, tmp_path):
        """Pins the PrepareVcf AF contract (VERDICT r2 item 7): thresholds
        compare float32-widened AFs against the double min-af
        (PrepareVcf.scala:69,72 — Scala Float >= Double), and kept AFs
        re-render as Java Float.toString, htsjdk's spelling for
        ArrayAttr[Float] (PrepareVcf.scala:72-78)."""
        b = VcfBuilder()
        # float32(0.01) = 0.00999999... < 0.01 -> the JAR DROPS this one.
        b.add("1", 100, "edge", ["A", "C"], info={"AF": "0.01"})
        # 0.0100001 widens above the threshold -> kept, respelled.
        b.add("1", 200, "above", ["A", "C"], info={"AF": "0.0100001"})
        # trailing-zero spelling normalizes (Float.toString is shortest).
        b.add("1", 300, "padded", ["A", "C"], info={"AF": "0.1350"})
        # multi-allelic: only the >= min-af alts/AFs survive.
        b.add("1", 400, "multi", ["A", "C", "G"], info={"AF": "0.5,0.001"})
        vcf_in = b.to_file(tmp_path / "in.vcf")
        out = tmp_path / "out.vcf"
        prepare_vcf.run(input=[vcf_in], output=out)
        records = [
            l for l in out.read_text().splitlines() if not l.startswith("#")
        ]
        got = {l.split("\t")[2]: l.split("\t")[7] for l in records}
        assert got == {
            "above": "AF=0.0100001",
            "padded": "AF=0.135",
            "multi": "AF=0.5",
        }
        alts = {l.split("\t")[2]: l.split("\t")[4] for l in records}
        assert alts["multi"] == "C"


class TestCliGuards:
    def test_guide_file_rejects_aux_pams(self, tmp_path):
        from calitas_tpu.cli import main

        gf = tmp_path / "g.tsv"
        gf.write_text("guide_id\tguide\ng1\tCTTGCCCCACAGGGCAGTAAnrg\n")
        with pytest.raises(SystemExit, match="aux_pams column"):
            main(["SearchReference", "--guide-file", str(gf), "-x", "nag",
                  "-r", "nope.fa", "-o", "out.tsv"])

    def test_guide_file_crlf_and_short_rows(self, tmp_path):
        from calitas_tpu.cli import _parse_guide_file

        gf = tmp_path / "g.tsv"
        gf.write_bytes(
            b"guide_id\tguide\taux_pams\r\n"
            b"g1\tCTTGCCCCACAGGGCAGTAAnrg\tnag\r\n"
        )
        specs = _parse_guide_file(str(gf))
        assert specs == [("g1", "CTTGCCCCACAGGGCAGTAAnrg", ["nag"])]

        bad = tmp_path / "bad.tsv"
        bad.write_text("guide_id\tguide\ng1\n")
        with pytest.raises(SystemExit, match="line 2"):
            _parse_guide_file(str(bad))

    def test_strict_bool(self):
        import argparse

        from calitas_tpu.cli import _strict_bool

        assert _strict_bool("true") and _strict_bool("TRUE")
        assert not _strict_bool("false")
        with pytest.raises(argparse.ArgumentTypeError):
            _strict_bool("yes")
