"""Worker-pool internals: finish-cache keying/eviction and error policy.

The CLAUDE.md invariant — worker caches key on every run-scoped output
column — plus the round-4 review findings: previous runs' entries must be
EVICTED (a resident server would otherwise leak one IndexedFasta mmap
per request), and the array-batch fallback must honor swallow_errors.
"""

import numpy as np
import pytest

from calitas_tpu.align.engine import SequentialAligner
from calitas_tpu.core.guide import Guide
from calitas_tpu.io.fasta import ReferenceSetBuilder
from calitas_tpu.parallel import host_pool as hp

KW = dict(
    max_guide_diffs=4, max_pam_diffs=1, max_gaps_between_guide_and_pam=3,
    max_total_diffs=8, max_overlap=5,
)


@pytest.fixture()
def ref_path(tmp_path):
    rng = np.random.default_rng(21)
    b = ReferenceSetBuilder(assembly="hp")
    b.add("chr1").add("".join(rng.choice(list("ACGT"), 5000)))
    return b.to_file(tmp_path / "ref.fa")


def _spec(ref_path, guide, aligner, *, timestamp, guide_id="g", **over):
    return hp.make_finish_spec(
        guide, aligner, KW, guide_id=guide_id, ref_path=ref_path,
        aligner_id="A", arguments="args", vcf_id=None, timestamp=timestamp,
        window_size=1000, guide_length=len(guide.guide) + 3, **over,
    )


def test_finish_cache_evicts_previous_runs(ref_path):
    guide = Guide.parse("GACGCATAAAGATGAGACGCnrg")
    aligner = SequentialAligner()
    hp._MP_FINISH_CACHE.clear()
    # run 1, two guides: two state entries coexist
    s1a = _spec(ref_path, guide, aligner, timestamp="t1", guide_id="g1")
    s1b = _spec(ref_path, guide, aligner, timestamp="t1", guide_id="g2")
    _, _, ref1, b1 = hp._mp_finish_state(s1a)
    hp._mp_finish_state(s1b)
    hp._render_consts_for(s1a, b1, guide)
    assert len(hp._MP_FINISH_CACHE) == 3
    # run 2 (new timestamp): run-1 entries evicted, their mmaps closed
    s2 = _spec(ref_path, guide, aligner, timestamp="t2", guide_id="g1")
    _, _, ref2, _ = hp._mp_finish_state(s2)
    keys = list(hp._MP_FINISH_CACHE)
    assert all(k[6] == "t2" for k in keys), keys
    assert ref1._fh.closed and not ref2._fh.closed
    # rows from run 2 render with run-2 metadata (the original invariant)
    assert hp._MP_FINISH_CACHE[hp._finish_cache_key(s2)][3].timestamp == "t2"


def test_batch_fallback_honors_swallow_errors(ref_path, monkeypatch):
    """A per-window failure inside the array-batch fallback must raise
    for swallow_errors=False callers instead of silently dropping rows."""
    guide = Guide.parse("GACGCATAAAGATGAGACGCnrg")
    aligner = SequentialAligner()
    hp._MP_FINISH_CACHE.clear()

    def run(swallow):
        spec = _spec(ref_path, guide, aligner, timestamp="ts",
                     swallow_errors=swallow)
        # break the whole-batch native path AND the per-window path for
        # one window by pointing at a nonexistent chromosome
        item = ("__batch__", "nope", np.array([100], np.int64), None, None)
        return hp._mp_finish_batch_item(spec, item)

    with pytest.raises(RuntimeError):
        run(swallow=False)
    assert run(swallow=True) == []  # logged and dropped


def test_finish_cache_key_covers_run_scoped_columns(ref_path):
    guide = Guide.parse("GACGCATAAAGATGAGACGCnrg")
    aligner = SequentialAligner()
    base = _spec(ref_path, guide, aligner, timestamp="t")
    k0 = hp._finish_cache_key(base)
    for field, val in [
        ("timestamp", "t2"), ("arguments", "other"), ("vcf_id", "v1"),
        ("aligner_id", "B"), ("aligner_version", "x"), ("guide_id", "g9"),
    ]:
        mod = dict(base)
        mod[field] = val
        assert hp._finish_cache_key(mod) != k0, field
