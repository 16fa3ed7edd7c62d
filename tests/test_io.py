"""IO-layer tests: indexed FASTA, dictionaries, metric TSV, VCF."""

import gzip

import numpy as np
import pytest

from calitas_tpu.io.fasta import (
    IndexedFasta,
    ReferenceSetBuilder,
    SequenceDictionary,
    extract_dictionary,
)
from calitas_tpu.io.vcf import VcfReader, VcfWriter, VcfHeader, PASSING_FILTERS
from calitas_tpu.io.tsv import MetricWriter, read_metrics, format_value


class TestIndexedFasta:
    @pytest.fixture()
    def fa(self, tmp_path):
        b = ReferenceSetBuilder(assembly="asm1", line_length=10)
        b.add("c1").add("ACGTACGTACGTACGTACGTAC")  # 22bp over 3 lines
        b.add("c2").add("TTTTGGGG")
        return IndexedFasta(b.to_file(tmp_path / "r.fa"))

    def test_subsequence_across_lines(self, fa):
        assert fa.get_subsequence("c1", 1, 22) == b"ACGTACGTACGTACGTACGTAC"
        assert fa.get_subsequence("c1", 7, 14) == b"GTACGTAC"  # spans a newline
        assert fa.get_subsequence("c2", 4, 5) == b"TG"

    def test_bounds(self, fa):
        with pytest.raises(ValueError):
            fa.get_subsequence("c1", 0, 5)
        with pytest.raises(ValueError):
            fa.get_subsequence("c1", 1, 23)
        with pytest.raises(KeyError):
            fa.get_subsequence("nope", 1, 2)

    def test_dictionary(self, fa):
        d = fa.dictionary
        assert d is not None
        assert d.index("c1") == 0 and d.index("c2") == 1
        assert d.index("unknown") == -1
        assert d.assembly == "asm1"
        assert d.get("c1").length == 22

    def test_iter_contigs(self, fa):
        names = [n for n, _ in fa.iter_contigs()]
        assert names == ["c1", "c2"]

    def test_extract_dictionary_requires_dict(self, tmp_path):
        (tmp_path / "x.fa").write_text(">a\nACGT\n")
        with pytest.raises(FileNotFoundError):
            extract_dictionary(tmp_path / "x.fa")


class TestMetricTsv:
    def test_format_value(self):
        assert format_value(None) == ""
        assert format_value(0.5) == "0.5"
        assert format_value(3) == "3"
        assert format_value("x") == "x"

    def test_format_float_java_double_tostring(self):
        # Java Double.toString semantics (VERDICT item 7): scientific
        # notation below 1e-3 / at or above 1e7, no '+' in exponents,
        # at least one fractional digit everywhere.
        assert format_value(1e-4) == "1.0E-4"
        assert format_value(-1e-4) == "-1.0E-4"
        assert format_value(0.001) == "0.001"
        assert format_value(0.0012345) == "0.0012345"
        assert format_value(9.999999e-4) == "9.999999E-4"
        assert format_value(1e7) == "1.0E7"
        assert format_value(9999999.0) == "9999999.0"
        assert format_value(12345678.9) == "1.23456789E7"
        assert format_value(0.30000000000000004) == "0.30000000000000004"
        assert format_value(1.0) == "1.0"
        assert format_value(100.0) == "100.0"
        assert format_value(0.0) == "0.0"
        assert format_value(-0.0) == "-0.0"
        assert format_value(float("inf")) == "Infinity"
        assert format_value(float("-inf")) == "-Infinity"
        assert format_value(float("nan")) == "NaN"
        assert format_value(123.456) == "123.456"
        assert format_value(5e-324) == "4.9E-324"  # Double.MIN_VALUE
        assert format_value(1.7976931348623157e308) == "1.7976931348623157E308"

    def test_float32_widen_af_parity(self):
        # The JAR reads AF as Float (SearchReference.scala:199) and widens
        # into Option[Double] (ReferenceHit.scala:54,233), so an input
        # 0.135 renders as 0.13500000536441803 via Double.toString.
        from calitas_tpu.io.tsv import float32_widen

        assert float32_widen("0.135") == 0.13500000536441803
        assert format_value(float32_widen("0.135")) == "0.13500000536441803"
        assert format_value(float32_widen("0.3")) == "0.30000001192092896"
        assert format_value(float32_widen("0.5")) == "0.5"  # float32-exact
        assert format_value(float32_widen("0.01")) == "0.009999999776482582"
        # Scala compares the widened Float against a Double threshold:
        # AF=0.01 fails a >= 0.01 min-AF filter (PrepareVcf.scala:69,72).
        assert not float32_widen("0.01") >= 0.01
        assert float32_widen("1e300") == float("inf")

    def test_format_java_float32_tostring(self):
        # PrepareVcf re-renders kept AFs as ArrayAttr[Float] through
        # htsjdk's encoder, i.e. Float.toString (PrepareVcf.scala:72-78):
        # shortest float32 round-trip in Java spelling.
        from calitas_tpu.io.tsv import format_java_float32

        assert format_java_float32(0.135) == "0.135"
        assert format_java_float32(0.1350) == "0.135"
        assert format_java_float32(1e-5) == "1.0E-5"
        assert format_java_float32(0.0005) == "5.0E-4"
        assert format_java_float32(0.001) == "0.001"
        assert format_java_float32(1.0) == "1.0"
        assert format_java_float32(0.0) == "0.0"
        assert format_java_float32(-0.25) == "-0.25"
        assert format_java_float32(1.4e-45) == "1.4E-45"  # Float.MIN_VALUE
        assert format_java_float32(3.4028235e38) == "3.4028235E38"
        assert format_java_float32(float("nan")) == "NaN"
        assert format_java_float32(float("inf")) == "Infinity"

    def test_roundtrip(self, tmp_path):
        from dataclasses import dataclass
        from typing import Optional

        @dataclass
        class Row:
            a: str
            b: int
            c: Optional[float]

        p = tmp_path / "m.tsv"
        with open(p, "w") as fh:
            w = MetricWriter(fh, Row)
            w.write(Row("x", 1, 0.25))
            w.write(Row("y", 2, None))
        rows = read_metrics(p, Row)
        assert rows == [Row("x", 1, 0.25), Row("y", 2, None)]


class TestVcf:
    def test_gzip_roundtrip(self, tmp_path):
        header = VcfHeader(lines=["##fileformat=VCFv4.2"], samples=[])
        p = tmp_path / "x.vcf.gz"
        w = VcfWriter(p, header)
        from calitas_tpu.io.vcf import VcfVariant

        w.write(
            VcfVariant(
                chrom="1", pos=5, id="rs1", ref="A", alts=("C",), qual="50",
                filters=frozenset({"PASS"}), info=(("AF", "0.5"),),
            )
        )
        w.close()
        with gzip.open(p, "rt") as fh:
            assert fh.read().count("rs1") == 1
        vs = list(VcfReader(p))
        assert vs[0].filters == PASSING_FILTERS
        assert vs[0].af() == [0.5]

    def test_multiallelic_and_missing(self, tmp_path):
        p = tmp_path / "x.vcf"
        p.write_text(
            "##fileformat=VCFv4.2\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            "1\t10\t.\tA\tC,G\t.\t.\tAF=0.1,0.2\n"
        )
        v = list(VcfReader(p))[0]
        assert v.id is None
        assert v.alts == ("C", "G")
        assert v.n_alleles == 3
        assert v.filters == frozenset()
        # AF parses through float32 then widens (SearchReference.scala:199
        # reads ArrayAttr[Float] into Option[Double] fields).
        assert v.af() == [0.10000000149011612, 0.20000000298023224]
        assert v.end == 10

    def test_symbolic_not_simple(self, tmp_path):
        p = tmp_path / "x.vcf"
        p.write_text(
            "##fileformat=VCFv4.2\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            "1\t10\t.\tA\t<DEL>\t.\tPASS\tAF=0.1\n"
        )
        v = list(VcfReader(p))[0]
        assert not v.alleles_are_simple()


class TestVcfIndex:
    """The once-per-run in-memory index must behave exactly like the
    streaming reader (SearchReference.scala:227-231 contract)."""

    def _write(self, tmp_path, records):
        p = tmp_path / "x.vcf"
        p.write_text(
            "##fileformat=VCFv4.2\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            + "".join(records)
        )
        return p

    def test_iter_and_query_match_reader(self, tmp_path):
        from calitas_tpu.io.vcf import VcfIndex

        p = self._write(tmp_path, [
            "1\t10\ta\tA\tC\t.\tPASS\tAF=0.1\n",
            "1\t20\tb\tAT\tA\t.\tPASS\tAF=0.2\n",
            "1\t35\tc\tA\tG\t.\tPASS\tAF=0.3\n",
            "2\t5\td\tC\tT\t.\tPASS\tAF=0.4\n",
        ])
        idx = VcfIndex(p)
        assert list(idx) == list(VcfReader(p))
        assert idx.chroms == ["1", "2"]
        for chrom, start, end in [("1", 1, 2**31 - 1), ("1", 11, 35),
                                  ("1", 20, 20), ("2", 1, 4), ("3", 1, 99)]:
            assert list(idx.query(chrom, start, end)) == list(
                VcfReader(p).query(chrom, start, end)
            ), (chrom, start, end)
        assert idx.header.lines == VcfReader(p).header.lines

    def test_unsorted_chrom_falls_back_linear(self, tmp_path):
        from calitas_tpu.io.vcf import VcfIndex

        p = self._write(tmp_path, [
            "1\t30\ta\tA\tC\t.\tPASS\tAF=0.1\n",
            "1\t10\tb\tA\tG\t.\tPASS\tAF=0.2\n",
        ])
        idx = VcfIndex(p)
        assert [v.pos for v in idx.query("1", 1, 20)] == [10]
        assert list(idx.query("1", 1, 40)) == list(VcfReader(p).query("1", 1, 40))


class TestBgzf:
    def test_vcf_gz_is_bgzf_with_eof_block(self, tmp_path):
        """PrepareVcf's .vcf.gz must be BGZF (htsjdk BlockCompressedOutputStream,
        PrepareVcf.scala:60): gzip-readable AND tabix-indexable — per-block
        BC size subfields plus the fixed 28-byte EOF marker."""
        from calitas_tpu.io.bgzf import EOF_BLOCK, is_bgzf

        header = VcfHeader(lines=["##fileformat=VCFv4.2"], samples=[])
        p = tmp_path / "x.vcf.gz"
        w = VcfWriter(p, header)
        from calitas_tpu.io.vcf import VcfVariant

        for i in range(5000):  # spill past one 64 KiB block
            w.write(
                VcfVariant(
                    chrom="1", pos=i + 1, id=f"rs{i}", ref="A", alts=("C",),
                    qual=None, filters=frozenset({"PASS"}),
                    info=(("AF", "0.5"),),
                )
            )
        w.close()
        raw = p.read_bytes()
        assert raw[:4] == b"\x1f\x8b\x08\x04" and raw[12:14] == b"BC"
        assert raw.endswith(EOF_BLOCK)
        assert is_bgzf(p)

        # every block's BSIZE walks exactly to EOF (spec-valid chain)
        import struct

        off, blocks = 0, 0
        while off < len(raw):
            assert raw[off : off + 4] == b"\x1f\x8b\x08\x04"
            xlen = struct.unpack_from("<H", raw, off + 10)[0]
            ext = raw[off + 12 : off + 12 + xlen]
            bsize = None
            e = 0
            while e < len(ext):
                si, sl = ext[e : e + 2], struct.unpack_from("<H", ext, e + 2)[0]
                if si == b"BC":
                    bsize = struct.unpack_from("<H", ext, e + 4)[0] + 1
                e += 4 + sl
            assert bsize is not None
            off += bsize
            blocks += 1
        assert off == len(raw) and blocks >= 3  # data blocks + EOF

        # content round-trips through plain gzip and our reader
        with gzip.open(p, "rt") as fh:
            assert fh.read().count("rs4999") == 1
        vs = list(VcfReader(p))
        assert len(vs) == 5000 and vs[0].id == "rs0"


class TestCompressedFasta:
    """htsjdk reads block-compressed FASTA transparently (reference
    README.md:63-68); IndexedFasta serves .fa.gz/.bgz through a
    decompressed cache with identical bytes and indices."""

    def _ref(self, tmp_path):
        from calitas_tpu.io.fasta import ReferenceSetBuilder

        import numpy as np

        rng = np.random.default_rng(3)
        b = ReferenceSetBuilder(assembly="gz")
        for c in ("chr1", "chr2"):
            b.add(c).add("".join(rng.choice(list("ACGTN"), 2500)))
        return b.to_file(tmp_path / "ref.fa")

    @pytest.mark.parametrize("codec", ["gzip", "bgzf"])
    def test_gz_fasta_matches_plain(self, tmp_path, codec):
        from calitas_tpu.io.fasta import IndexedFasta
        from calitas_tpu.io.bgzf import BgzfWriter

        import numpy as np

        fa = self._ref(tmp_path)
        gz = tmp_path / "ref.fa.gz"
        data = fa.read_bytes()
        if codec == "gzip":
            with gzip.open(gz, "wb") as fh:
                fh.write(data)
        else:
            w = BgzfWriter(gz)
            w.write(data)
            w.close()
        # htsjdk convention: the sidecar .fai/.dict sit next to the .gz
        import shutil

        shutil.copy(str(fa) + ".fai", str(gz) + ".fai")
        plain = IndexedFasta(fa)
        comp = IndexedFasta(gz)
        assert comp.names == plain.names
        # dict_path_for strips .fa.gz -> the same ref.dict as the plain file
        assert [e.name for e in comp.dictionary] == [
            e.name for e in plain.dictionary
        ]
        for c in plain.names:
            np.testing.assert_array_equal(comp.get_bases(c), plain.get_bases(c))
            assert comp.get_subsequence(c, 100, 180) == plain.get_subsequence(c, 100, 180)

    def test_gz_fasta_without_fai_builds_one(self, tmp_path):
        from calitas_tpu.io.fasta import IndexedFasta

        import numpy as np

        fa = self._ref(tmp_path)
        gz = tmp_path / "noidx.fa.gz"
        with gzip.open(gz, "wb") as fh:
            fh.write(fa.read_bytes())
        comp = IndexedFasta(gz)  # no .fai sidecar: built from the cache
        plain = IndexedFasta(fa)
        for c in plain.names:
            np.testing.assert_array_equal(comp.get_bases(c), plain.get_bases(c))

    def test_search_reference_on_gz(self, tmp_path):
        """End to end: the production search (native renderer included)
        over a bgzf-compressed reference matches the plain-FASTA table."""
        import shutil

        import numpy as np

        from calitas_tpu.io.bgzf import BgzfWriter
        from calitas_tpu.io.fasta import ReferenceSetBuilder
        from calitas_tpu.tools import search_reference

        rng = np.random.default_rng(9)
        proto = "GACGCATAAAGATGAGACGC"
        seq = list("".join(rng.choice(list("ACGT"), 20_000)))
        for k in range(3):
            p = 2000 + k * 6000
            seq[p : p + 23] = list(proto + "TGG")
        b = ReferenceSetBuilder(assembly="gz")
        b.add("chr1").add("".join(seq))
        fa = b.to_file(tmp_path / "ref.fa")
        gz = tmp_path / "ref.fa.gz"
        w = BgzfWriter(gz)
        w.write(fa.read_bytes())
        w.close()
        shutil.copy(str(fa) + ".fai", str(gz) + ".fai")
        shutil.copy(tmp_path / "ref.dict", tmp_path / "ref.fa.dict")

        def rows(ref, out):
            search_reference.run(
                guide=proto + "nrg", guide_id="g", ref=ref, output=out,
                max_guide_diffs=4,
            )
            got = []
            with open(out) as fh:
                header = fh.readline().rstrip("\n").split("\t")
                ts = header.index("time_stamp")
                for line in fh:
                    f = line.rstrip("\n").split("\t")
                    f[ts] = ""
                    got.append(tuple(f))
            return got

        r_plain = rows(fa, tmp_path / "plain.txt")
        r_gz = rows(gz, tmp_path / "gz.txt")
        assert len(r_plain) >= 3
        assert r_gz == r_plain


def test_dict_path_for_bgz_suffixes():
    from calitas_tpu.io.fasta import dict_path_for

    assert dict_path_for("x/ref.fa.bgz").name == "ref.dict"
    assert dict_path_for("x/ref.fasta.bgz").name == "ref.dict"
    assert dict_path_for("x/ref.fa.gz").name == "ref.dict"
    assert dict_path_for("x/ref.fa").name == "ref.dict"


def test_vcf_gz_utf8_header(tmp_path):
    """VCF 4.3 allows UTF-8 in header text; the BGZF write path must not
    crash on it (parity with the plain-text and gzip read paths)."""
    header = VcfHeader(
        lines=["##fileformat=VCFv4.3", "##source=étude-ß"], samples=[]
    )
    p = tmp_path / "u.vcf.gz"
    w = VcfWriter(p, header)
    w.close()
    with gzip.open(p, "rt", encoding="utf-8") as fh:
        assert "étude-ß" in fh.read()


class TestCompressedFastaCacheHygiene:
    """ADVICE r4: corrupt compressed input must surface as such (not as a
    cache-dir error), and stale mtime-keyed caches must not accumulate."""

    def test_corrupt_gz_raises_clear_error(self, tmp_path):
        from calitas_tpu.io.fasta import IndexedFasta

        gz = tmp_path / "bad.fa.gz"
        real = gzip.compress(b">chr1\nACGTACGT\n")
        gz.write_bytes(real[: len(real) // 2])  # truncated stream
        (tmp_path / "bad.fa.gz.fai").write_text("chr1\t8\t6\t8\t9\n")
        with pytest.raises(OSError, match="corrupt compressed FASTA"):
            IndexedFasta(gz)

    def test_stale_caches_evicted_on_rewrite(self, tmp_path):
        import os
        import time

        from calitas_tpu.io.fasta import IndexedFasta, ReferenceSetBuilder

        b = ReferenceSetBuilder(assembly="ev")
        b.add("chr1").add("ACGT" * 200)
        fa = b.to_file(tmp_path / "ev.fa")
        gz = tmp_path / "ev.fa.gz"
        with gzip.open(gz, "wb") as fh:
            fh.write(fa.read_bytes())
        import shutil

        shutil.copy(str(fa) + ".fai", str(gz) + ".fai")
        IndexedFasta(gz).get_subsequence("chr1", 1, 8)
        first = sorted(tmp_path.glob(".ev.fa.gz.calitas_cache_*.fa"))
        assert len(first) == 1
        # Touch the source -> new mtime key -> new cache; old one evicted.
        t = time.time() + 5
        os.utime(gz, (t, t))
        IndexedFasta(gz).get_subsequence("chr1", 1, 8)
        second = sorted(tmp_path.glob(".ev.fa.gz.calitas_cache_*.fa"))
        assert len(second) == 1
        assert second[0].name != first[0].name
