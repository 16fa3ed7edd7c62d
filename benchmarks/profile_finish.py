"""Host-finish profiler: decompose the per-candidate cost of the
production finish path (materialize + native finish_batch + render +
collect + dedup/sort + TSV) on the bench.py hash genome, all on CPU.

Usage: python benchmarks/profile_finish.py [genome_Mb] [--cprofile]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import bench as benchmod
from calitas_tpu.align.engine import SequentialAligner
from calitas_tpu.core.guide import Guide
from calitas_tpu.io.fasta import (
    DictEntry,
    IndexedFasta,
    SequenceDictionary,
    build_fai,
)
from calitas_tpu.io.tsv import MetricWriter
from calitas_tpu.ops.genome_screen import GenomeScreen
from calitas_tpu.parallel.screen_runner import GuideTask, screened_search
from calitas_tpu.search.hits import ReferenceHit, dedup_and_sort


def main() -> None:
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 64.0
    use_cprofile = "--cprofile" in sys.argv
    G = int(genome_mb * 1e6)

    guide = Guide.parse(benchmod.GUIDE)
    aligner = SequentialAligner()
    align_kwargs = dict(
        max_guide_diffs=5, max_pam_diffs=1,
        max_gaps_between_guide_and_pam=3, max_total_diffs=9, max_overlap=10,
    )
    window_size = 1000
    step = window_size - (len(benchmod.GUIDE) + 5 + 3 - 1)

    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    bases = letters[benchmod.host_genome_codes(0, G)]
    import tempfile

    tmpdir = tempfile.mkdtemp(prefix="calitas_prof_")
    fa = os.path.join(tmpdir, "ref.fa")
    benchmod.write_fasta(fa, bases)
    build_fai(fa)
    dictionary = SequenceDictionary(
        [DictEntry(name="chr1", length=G, assembly="bench")]
    )
    ref_file = IndexedFasta(fa)

    screen = GenomeScreen(aligner.scorer, window=window_size)
    t0 = time.perf_counter()
    genome_dev = screen.stage(bases)
    genome_dev.block_until_ready()
    print(f"stage: {time.perf_counter()-t0:.2f}s")
    prestaged = {"chr1": genome_dev}

    gtasks = [
        GuideTask(guide_id="bench", guide=guide,
                  guide_length=len(benchmod.GUIDE), step_size=step)
    ]
    hit_spec = dict(
        ref_path=fa, aligner_id="CALITAS:SearchReference",
        arguments="bench", vcf_id=None,
        timestamp="Mon Jan 01 00:00:00 UTC 2026",
    )

    def run(threads):
        hits = []
        t0 = time.perf_counter()
        for _t, _c, _s, rows in screened_search(
            ref_file, None, gtasks, aligner,
            window_size=window_size, threads=threads, swallow_errors=True,
            hit_spec=hit_spec, screen=screen, prestaged=prestaged,
            **align_kwargs,
        ):
            hits.extend(rows)
        t_search = time.perf_counter() - t0
        t0 = time.perf_counter()
        keepers = dedup_and_sort(hits, align_kwargs["max_overlap"], dictionary)
        t_dedup = time.perf_counter() - t0
        import io

        t0 = time.perf_counter()
        buf = io.StringIO()
        writer = MetricWriter(buf, ReferenceHit)
        writer.write_all(keepers)
        t_write = time.perf_counter() - t0
        print(
            f"threads={threads}: search+finish={t_search:.3f}s "
            f"dedup_sort={t_dedup:.3f}s tsv={t_write:.3f}s "
            f"hits={len(hits)} kept={len(keepers)}"
        )
        return hits

    # Warm (compile + pool spin)
    run(1)
    if use_cprofile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        run(1)
        pr.disable()
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(35)
    else:
        run(1)
        run(4)


if __name__ == "__main__":
    main()
