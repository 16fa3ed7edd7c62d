"""RenderedHit: the light pre-rendered row the finish workers ship.
Pins that (a) lazy field access parses the line back to the exact
ReferenceHit, (b) the pickle roundtrip is small and faithful, and
(c) render -> parse -> render is the identity on realistic rows."""

import dataclasses
import pickle

from calitas_tpu.io.tsv import fields_of, parse_row, render_row
from calitas_tpu.search.hits import ReferenceHit, RenderedHit

FIELDS = fields_of(ReferenceHit)


def make_hit(**over) -> ReferenceHit:
    base = dict(
        guide_id="g1",
        unpadded_guide_sequence="ACGTACGTACGTACGTACGT",
        genome_build="hg38",
        chromosome="chr2",
        coordinate_start=1234,
        coordinate_end=1254,
        strand="-",
        unpadded_target_sequence="ACGTACGTACGTACGTACGA",
        ten_bases_5_prime="TTTTTTTTTT",
        ten_bases_3_prime="GGGGGGGGGG",
        pam_used="ngg",
        variant_id=None,
        variant_description=None,
        variant_vcf=None,
        allele_frequency=None,
        score=1350,
        guide_mm=1,
        guide_gaps=0,
        guide_mm_plus_gaps=1,
        pam_mm=0,
        total_mm_plus_gaps=1,
        padded_guide="ACGTACGTACGTACGTACGTngg",
        padded_alignment="|||||||||||||||||||.|||",
        padded_target="ACGTACGTACGTACGTACGATGG",
        padded_extra_8_bases_5_prime="AAAAAAAA",
        padded_extra_8_bases_3_prime="CCCCCCCC",
        cigar="19=1X",
        unpadded_guide_sequence_length=20,
        unpadded_target_sequence_length=20,
        aligner="CALITAS:SearchReference",
        aligner_version="20260817-abc",
        aligner_search_pam="ngg",
        aligner_other_parameters="a=b",
        time_stamp="Mon Jan 01 00:00:00 UTC 2026",
    )
    base.update(over)
    return ReferenceHit(**base)


def rendered(hit: ReferenceHit) -> RenderedHit:
    r = RenderedHit.of(hit, render_row(hit, FIELDS))
    # Drop the eagerly-attached full object to force the lazy parse the
    # parent side would perform.
    r._full = None
    return r


def test_eager_key_fields_and_lazy_parse():
    hit = make_hit()
    r = rendered(hit)
    assert (r.guide_id, r.chromosome, r.strand) == ("g1", "chr2", "-")
    assert r.coordinate_start == 1234 and r.score == 1350
    assert r.end == hit.end
    # lazy fields parse from the line
    assert r.padded_target == hit.padded_target
    assert r.allele_frequency is None
    assert dataclasses.asdict(r._full) == dataclasses.asdict(hit)


def test_pickle_roundtrip_is_light_and_faithful():
    hit = make_hit(allele_frequency=1e-4, variant_id="rs1",
                   variant_description="rs1:9:A>T:0.000", variant_vcf="v:md5")
    r = rendered(hit)
    blob = pickle.dumps([r] * 100)
    assert len(blob) / 100 < 700  # line + keys, not a 34-field dict
    r2 = pickle.loads(blob)[0]
    assert r2.end == hit.end
    assert dataclasses.asdict(
        parse_row(r2._line, ReferenceHit)
    ) == dataclasses.asdict(hit)


def test_render_parse_render_identity():
    for hit in (
        make_hit(),
        make_hit(allele_frequency=1e-4),
        make_hit(allele_frequency=0.30000000000000004),
        make_hit(pam_used=None, padded_extra_8_bases_5_prime=""),
    ):
        line = render_row(hit, FIELDS)
        again = render_row(parse_row(line, ReferenceHit), FIELDS)
        assert again == line


def test_remove_overlaps_vector_matches_scan():
    """The vectorized global dedup must return the exact keepers in the
    exact order of the sequential-scan implementation, across dense
    overlap chains, score ties, variant groups and degenerate
    max_overlap values."""
    import numpy as np

    from calitas_tpu.io.fasta import DictEntry, SequenceDictionary
    from calitas_tpu.search.hits import (
        RenderedHit,
        _remove_overlaps_scan,
        _remove_overlaps_vector,
    )

    rng = np.random.default_rng(23)
    chroms = ["chr1", "chr2", "chr10"]
    dictionary = SequenceDictionary(
        [DictEntry(name=c, length=10**6, assembly="t") for c in chroms]
    )

    def make_hits(n, span):
        out = []
        for i in range(n):
            start = int(rng.integers(0, span))
            length = int(rng.integers(20, 35))
            out.append(
                RenderedHit(
                    f"g{int(rng.integers(0, 2))}",
                    chroms[int(rng.integers(0, 3))],
                    "+-"[int(rng.integers(0, 2))],
                    (None, "", "1:5:A:T")[int(rng.integers(0, 3))],
                    start,
                    int(rng.integers(0, 5)) * 100,  # heavy score ties
                    start + length - 1,
                    f"line{i}",
                )
            )
        return out

    # force both implementations over the same inputs regardless of size
    def scan(hs, mo, d):
        return [h._line for h in _remove_overlaps_scan(hs, mo, d)]

    from calitas_tpu.search.hits import dedup_and_sort, sort_hits

    # dense, sparse, and large enough to take the fused vector path
    for span, n in ((400, 3000), (100_000, 3000), (2000, 12_000)):
        hs = make_hits(n, span)
        for mo in (-1, 0, 1, 5, 30, 1000):
            for d in (dictionary, None):
                expect = scan(hs, mo, d)
                got = [h._line for h in _remove_overlaps_vector(hs, mo, d)]
                assert got == expect, (span, mo, d is not None)
                # the fused production path == the two-call sequence
                want = [
                    h._line
                    for h in sort_hits(_remove_overlaps_scan(hs, mo, d), d)
                ]
                fused = [h._line for h in dedup_and_sort(hs, mo, d)]
                assert fused == want, (span, mo, d is not None)


def test_sort_hits_lexsort_matches_tuple_sort():
    """The vectorized large-table sort must match the tuple-key sort
    exactly, including insertion stability on full-key ties."""
    import numpy as np

    from calitas_tpu.io.fasta import DictEntry, SequenceDictionary
    from calitas_tpu.search.hits import RenderedHit, sort_hits

    rng = np.random.default_rng(17)
    dictionary = SequenceDictionary(
        [DictEntry(name=c, length=10**6, assembly="t") for c in
         ("chr1", "chr2", "chr10")]
    )
    N = 10_000  # above the numpy threshold
    hits = [
        RenderedHit(
            f"g{i % 3}", rng.choice(["chr1", "chr2", "chr10"]),
            rng.choice(["+", "-"]), None,
            int(rng.integers(0, 50)),  # few distinct starts -> many ties
            int(rng.integers(0, 4)) * 100, 30, f"line{i}",
        )
        for i in range(N)
    ]
    for d in (dictionary, None):
        key = (
            (lambda h: (dictionary.index(h.chromosome), h.coordinate_start,
                        h.strand, -h.score))
            if d is not None
            else (lambda h: (h.chromosome, h.coordinate_start, h.strand,
                             -h.score))
        )
        expect = sorted(hits, key=key)
        got = sort_hits(hits, d)
        assert [h._line for h in got] == [h._line for h in expect]


class TestRenderedBlock:
    def _mk_block(self, rng, guide_id, chrom, n, base=0):
        import numpy as np

        from calitas_tpu.search.hits import RenderedBlock

        starts = np.sort(rng.choice(10**7, n, replace=False)) + base
        scores = rng.integers(500, 1600, n)
        ends = starts + rng.integers(18, 26, n)
        strands = np.where(rng.random(n) < 0.5, 43, 45).astype(np.uint8)
        lines = []
        offs = [0]
        for i in range(n):
            l = f"{guide_id}\t{chrom}\t{int(starts[i])}\trow\n"
            lines.append(l.encode())
            offs.append(offs[-1] + len(lines[-1]))
        return RenderedBlock(
            guide_id, chrom, strands, starts.astype(np.int64),
            scores.astype(np.int64), ends.astype(np.int64),
            np.asarray(offs, np.int64), b"".join(lines),
        )

    def test_iter_and_row_roundtrip(self):
        import numpy as np

        rng = np.random.default_rng(5)
        blk = self._mk_block(rng, "g", "chr1", 50)
        rows = list(blk)
        assert len(rows) == 50
        for i, r in enumerate(rows):
            assert r.guide_id == "g" and r.chromosome == "chr1"
            assert r.coordinate_start == int(blk.starts[i])
            assert r.score == int(blk.scores[i])
            assert r.end == int(blk.ends[i])
            assert r.strand == ("+" if blk.strands[i] == 43 else "-")
            assert r._line == blk.line(i)

    def test_mixed_dedup_equals_flattened(self):
        """dedup_and_sort over blocks must be row-identical to the same
        call over the flattened RenderedHit list — including the
        first-appearance group numbering that resolves full-key ties."""
        import numpy as np

        from calitas_tpu.io.fasta import DictEntry, SequenceDictionary
        from calitas_tpu.search.hits import dedup_and_sort

        rng = np.random.default_rng(7)
        d = SequenceDictionary(
            [DictEntry(name="chr1", length=10**8, assembly="t"),
             DictEntry(name="chr2", length=10**8, assembly="t")]
        )
        mixed = [
            self._mk_block(rng, "g1", "chr1", 4000),
            self._mk_block(rng, "g2", "chr1", 3000),
            self._mk_block(rng, "g1", "chr2", 3000),
        ]
        # overlapping duplicates to actually exercise the drop chain
        dup = self._mk_block(rng, "g1", "chr1", 2000)
        dup.starts[:] = mixed[0].starts[:2000] + 3
        dup.ends[:] = dup.starts + 21
        dup.strands[:] = mixed[0].strands[:2000]
        mixed.append(dup)
        # plus plain object rows interleaved
        objs = list(self._mk_block(rng, "g3", "chr2", 500))
        mixed.extend(objs)

        flat = [r for b in mixed[:4] for r in b] + objs
        got = dedup_and_sort(mixed, 10, d)
        want = dedup_and_sort(flat, 10, d)
        assert len(got) == len(want)
        for a, b in zip(got, want):
            assert a._line == b._line
            assert (a.guide_id, a.chromosome, a.strand, a.coordinate_start,
                    a.score, a.end) == (
                b.guide_id, b.chromosome, b.strand, b.coordinate_start,
                b.score, b.end,
            )

    def test_small_mixed_list_matches_scan(self):
        """Below the vector threshold the mixed path must still match
        the object-path scan dedup."""
        import numpy as np

        from calitas_tpu.io.fasta import DictEntry, SequenceDictionary
        from calitas_tpu.search.hits import dedup_and_sort

        rng = np.random.default_rng(9)
        d = SequenceDictionary([DictEntry(name="chr1", length=10**8,
                                          assembly="t")])
        blk = self._mk_block(rng, "g", "chr1", 40)
        got = dedup_and_sort([blk], 10, d)
        want = dedup_and_sort(list(blk), 10, d)
        assert [r._line for r in got] == [r._line for r in want]


def test_dedup_sort_serialize_byte_identical():
    """The fused dedup+sort+serialize path must produce exactly the bytes
    MetricWriter.write_all(dedup_and_sort(...)) would, over mixed
    rows/blocks AND pure-object lists."""
    import io

    import numpy as np

    from calitas_tpu.io.fasta import DictEntry, SequenceDictionary
    from calitas_tpu.io.tsv import MetricWriter
    from calitas_tpu.search.hits import (
        ReferenceHit,
        dedup_and_sort,
        dedup_sort_serialize,
        iter_rows,
    )

    rng = np.random.default_rng(5)
    mk = TestRenderedBlock()._mk_block
    d = SequenceDictionary(
        [DictEntry(name="chr1", length=10**8, assembly="t"),
         DictEntry(name="chr2", length=10**8, assembly="t")]
    )
    blocks = [
        mk(rng, "g1", "chr1", 4000),
        mk(rng, "g2", "chr2", 3000),
    ]
    for hits in (blocks, list(iter_rows(blocks))):
        keepers = dedup_and_sort(hits, 10, d)
        buf = io.StringIO()
        MetricWriter(buf, ReferenceHit).write_all(keepers)
        body_want = buf.getvalue().split("\n", 1)[1]
        body, n_keep, n_fwd = dedup_sort_serialize(hits, 10, d)
        assert body.decode("ascii") == body_want
        assert n_keep == len(keepers)
        assert n_fwd == sum(1 for h in keepers if h.strand == "+")
    # empty input
    body, n_keep, n_fwd = dedup_sort_serialize([], 10, None)
    assert body == b"" and n_keep == 0 and n_fwd == 0
