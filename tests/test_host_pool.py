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


def _x10_worker(spec, chunk):
    return [x * 10 for x in chunk]


def _identity(x):
    return x


class TestFeedDrainDecoupling:
    """Round-5: map_items_mp feeds/submits from a producer thread while
    the caller's thread only drains (the measured round-4 feed-starvation
    fix).  Contracts: submission-order yielding, iterator-exception
    propagation, clean producer shutdown on early abandonment — on both
    the decoupled and legacy paths."""

    @staticmethod
    def _run(items, flag, **kw):
        import calitas_tpu.parallel.host_pool as hp

        old = hp.FEED_THREAD
        hp.FEED_THREAD = flag
        try:
            return list(
                hp.map_items_mp(
                    items, {"key": "k"}, 2, worker_fn=_x10_worker,
                    to_payload=_identity, chunk=3, **kw,
                )
            )
        finally:
            hp.FEED_THREAD = old

    @pytest.mark.parametrize("flag", [True, False])
    def test_ordered_yield(self, flag):
        # >4*chunk items so the mp head-probe keeps processes > 1
        items = list(range(40))
        got = self._run(items, flag)
        assert got == [(x, x * 10) for x in items]

    @pytest.mark.parametrize("flag", [True, False])
    def test_iterator_exception_propagates(self, flag):
        def stream():
            yield from range(20)
            raise KeyError("stream died")

        with pytest.raises(KeyError, match="stream died"):
            self._run(stream(), flag)

    def test_early_abandonment_stops_producer(self):
        import threading
        import time

        import calitas_tpu.parallel.host_pool as hp

        produced = []

        def stream():
            for i in range(10_000):
                produced.append(i)
                yield i

        hp.FEED_THREAD = True
        gen = hp.map_items_mp(
            stream(), {"key": "k"}, 2, worker_fn=_x10_worker,
            to_payload=_identity, chunk=3,
        )
        next(gen)
        gen.close()  # GeneratorExit: the finally must stop the feeder
        time.sleep(0.3)
        n_after = len(produced)
        time.sleep(0.3)
        assert len(produced) == n_after  # producer no longer pulling
        assert not any(
            t.name == "calitas-feed" and t.is_alive()
            for t in threading.enumerate()
        )


class TestIterBlocksThreaded:
    def test_blocks_and_order(self):
        from calitas_tpu.parallel.host_pool import iter_blocks_threaded

        got = list(iter_blocks_threaded(iter(range(10)), 4))
        assert got == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
        got = list(iter_blocks_threaded(iter(range(8)), 4, enabled=False))
        assert got == [[0, 1, 2, 3], [4, 5, 6, 7]]

    def test_exception_propagates(self):
        from calitas_tpu.parallel.host_pool import iter_blocks_threaded

        def stream():
            yield 1
            raise ValueError("builder failed")

        with pytest.raises(ValueError, match="builder failed"):
            list(iter_blocks_threaded(stream(), 4))

    def test_abandonment_stops_producer(self):
        import threading
        import time

        from calitas_tpu.parallel.host_pool import iter_blocks_threaded

        pulled = []

        def stream():
            for i in range(100_000):
                pulled.append(i)
                yield i

        it = iter_blocks_threaded(stream(), 8, depth=1)
        next(it)
        it.close()
        time.sleep(0.3)
        n = len(pulled)
        time.sleep(0.2)
        assert len(pulled) == n
        assert not any(
            t.name == "calitas-blocks" and t.is_alive()
            for t in threading.enumerate()
        )
