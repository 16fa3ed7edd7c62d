"""Multi-host orchestration of genome searches.

Design (SURVEY.md §2.10): the genome is partitioned across hosts by
whole contigs (a contig is the natural shard unit: the global dedup
groups by (guide, chromosome, strand, variant_description), so no dedup
group ever spans two shards).  Each host runs its contig subset with the
ordinary single-host engine — its chips shard windows over the local mesh
via ICI — and writes a raw per-host hit file.  Merging is then exact:
concatenate raw hits, run the same global dedup + dictionary sort, and
the table is row-identical to a single-host run.

The merge step is pure host code (no collective needed — hit tables are
tiny); on a jax.distributed deployment the same partitioning runs with
``host_contig_partition(names, process_index, process_count)``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

from calitas_tpu.io.fasta import SequenceDictionary
from calitas_tpu.io.tsv import MetricWriter, open_output, read_metrics
from calitas_tpu.search.hits import ReferenceHit, sort_hits


def host_contig_partition(
    contigs: Sequence[tuple[str, int]], process_index: int, process_count: int
) -> list[str]:
    """Greedy longest-first balanced partition of contigs over hosts;
    deterministic for a given dictionary."""
    order = sorted(contigs, key=lambda c: (-c[1], c[0]))
    loads = [0] * process_count
    mine: list[str] = []
    for name, length in order:
        h = min(range(process_count), key=lambda i: (loads[i], i))
        loads[h] += length
        if h == process_index:
            mine.append(name)
    return mine


def merge_host_outputs(
    hit_files: Sequence[str | Path],
    dictionary: Optional[SequenceDictionary],
    output: Optional[str | Path],
) -> int:
    """Merge per-host standard hit tables into the canonical global table.

    Each host ran the ordinary tool over its contig subset, so its table
    already contains the globally-deduped keepers for its dedup groups
    (groups are per-chromosome and never span hosts).  The merge is
    therefore exactly: concatenate + global dictionary sort — provably
    row-identical to a single-host run.  Returns the rows written."""
    hits: list[ReferenceHit] = []
    for f in hit_files:
        hits.extend(read_metrics(f, ReferenceHit))
    ordered = sort_hits(hits, dictionary)
    out_fh = open_output(output)
    writer = MetricWriter(out_fh, ReferenceHit)
    writer.write_all(ordered)
    writer.close()
    import sys

    if out_fh is not sys.stdout:
        out_fh.close()
    return len(ordered)
