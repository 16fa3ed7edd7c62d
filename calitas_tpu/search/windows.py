"""Genome windowing: fixed-size overlapping windows over FASTA contigs.

Parity contract: SearchReference.scala:28-95 (SURVEY.md §2.5).  Windows
start every ``step_size`` from ``range(0, len-1)``; ``end = min(len,
start + window_size)``; leading/trailing ``N`` (uppercase byte only, as in
the reference) are trimmed; fully-N windows yield a 1-byte placeholder;
bases are uppercased after trimming.  Emitted coordinates are 1-based
closed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from calitas_tpu.io.fasta import IndexedFasta

_N = ord("N")
_UPPER_OFFSET = ord("a") - ord("A")


@dataclass
class RefWindow:
    chrom: str
    start: int  # 1-based closed
    end: int
    bases: np.ndarray  # uint8, uppercased


#: byte -> uppercase byte (single-gather uppercase: one pass, no boolean
#: temporaries — ~3x faster than copy+mask+subtract per window)
_UPPER_TABLE = np.arange(256, dtype=np.uint8)
_UPPER_TABLE[ord("a") : ord("z") + 1] -= _UPPER_OFFSET


def upper_bytes(b: np.ndarray) -> np.ndarray:
    return _UPPER_TABLE[b]


def materialize_window(
    name: str, bases: np.ndarray, start: int, window_size: int
) -> RefWindow:
    """Build the reference-semantics window at ``start``: N-trim both ends
    (uppercase N only), uppercase, 1-based closed coordinates
    (SearchReference.scala:52-68)."""
    length = len(bases)
    end = min(length, start + window_size)
    adj_start, adj_end = start, end
    # Vectorized N-trim: genome assembly gaps are megabases of N, and a
    # per-byte Python loop costs seconds per genome pass on the host path.
    non_n = np.flatnonzero(bases[start:end] != _N)
    if len(non_n):
        adj_start = start + int(non_n[0])
        adj_end = start + int(non_n[-1]) + 1
    else:
        # all-N: the reference's first loop runs adjustedStart all the
        # way to end, so the empty window reports (end+1, end)
        adj_start = adj_end = end
    if adj_end - adj_start <= 0:
        window_bases = np.zeros(1, dtype=np.uint8)  # the reference's Array[Byte](0)
    else:
        window_bases = upper_bytes(bases[adj_start:adj_end])
    return RefWindow(name, adj_start + 1, adj_end, window_bases)


def window_iterator(
    fasta: IndexedFasta,
    window_size: int,
    step_size: int,
    chrom: Optional[str] = None,
) -> Iterator[RefWindow]:
    if chrom is not None:
        contigs = [(chrom, fasta.get_bases(chrom))]
    else:
        contigs = fasta.iter_contigs()

    for name, bases in contigs:
        for start in range(0, len(bases) - 1, step_size):
            yield materialize_window(name, bases, start, window_size)
