"""Window materialization unit tests (SearchReference.scala:39-71 semantics)."""

import numpy as np

from calitas_tpu.search.windows import materialize_window, window_iterator
from calitas_tpu.utils import camel_to_gnu


def b(s):
    return np.frombuffer(s.encode(), dtype=np.uint8)


class TestMaterializeWindow:
    def test_plain_window(self):
        w = materialize_window("c", b("ACGTACGTAC"), 2, 4)
        assert (w.start, w.end) == (3, 6)  # 1-based closed
        assert w.bases.tobytes() == b"GTAC"

    def test_n_trimming_both_ends(self):
        w = materialize_window("c", b("NNACGTNN"), 0, 8)
        assert (w.start, w.end) == (3, 6)
        assert w.bases.tobytes() == b"ACGT"

    def test_fully_n_window_placeholder(self):
        # the reference emits a 1-byte placeholder array (scala :40,62)
        w = materialize_window("c", b("NNNNNNNN"), 0, 8)
        assert len(w.bases) == 1 and w.bases[0] == 0

    def test_lowercase_n_not_trimmed_but_uppercased(self):
        # the reference trims only uppercase 'N' bytes, then uppercases
        w = materialize_window("c", b("nnACGTnn"), 0, 8)
        assert w.bases.tobytes() == b"NNACGTNN"
        assert (w.start, w.end) == (1, 8)

    def test_window_clipped_at_contig_end(self):
        w = materialize_window("c", b("ACGT"), 2, 10)
        assert (w.start, w.end) == (3, 4)
        assert w.bases.tobytes() == b"GT"


class TestWindowIteratorEdges:
    def test_single_base_contig_yields_nothing(self, tmp_path):
        from calitas_tpu.io.fasta import IndexedFasta, ReferenceSetBuilder

        builder = ReferenceSetBuilder()
        builder.add("tiny").add("A")
        fa = IndexedFasta(builder.to_file(tmp_path / "t.fa"))
        assert list(window_iterator(fa, 100, 90, None)) == []


class TestCamelToGnu:
    def test_conversions(self):
        assert camel_to_gnu("maxVariants") == "max-variants"
        assert camel_to_gnu("maxGapsBetweenGuideAndPam") == "max-gaps-between-guide-and-pam"
        assert camel_to_gnu("windowSize") == "window-size"
        assert camel_to_gnu("simple") == "simple"


def test_all_n_window_coordinates_match_reference_loop():
    """The vectorized N-trim must reproduce the reference's per-byte
    loop exactly, including the all-N window's (end+1, end) coordinates
    (SearchReference.scala:56-68)."""
    from calitas_tpu.search.windows import materialize_window

    bases = np.frombuffer(b"NNNNNNNNNN", dtype=np.uint8).copy()
    w = materialize_window("c", bases, 2, 5)
    assert (w.start, w.end) == (8, 7)  # adj_start ran to end=7 (0-based)
    assert len(w.bases) == 1  # the 1-byte placeholder

    # mixed: trim both sides
    bases = np.frombuffer(b"NNACGTNNNN", dtype=np.uint8).copy()
    w = materialize_window("c", bases, 0, 10)
    assert (w.start, w.end) == (3, 6)
    assert w.bases.tobytes() == b"ACGT"
