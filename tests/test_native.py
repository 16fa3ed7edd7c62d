"""Native C++ engine vs NumPy oracle: differential equivalence."""

import numpy as np
import pytest

from calitas_tpu import native
from calitas_tpu.core.scoring import derive_scorer
from calitas_tpu.core.sequence import encode_query, encode_target
from calitas_tpu.align import oracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

RNG = np.random.default_rng(11)


def test_native_matches_numpy_fuzz():
    scorer = derive_scorer()
    for trial in range(50):
        Q = int(RNG.integers(6, 28))
        query = "".join(RNG.choice(list("ACGT"), Q))
        qb, qm = query.encode(), encode_query(query)
        t = "".join(RNG.choice(list("ACGTN"), int(RNG.integers(Q, 240))))
        tm = encode_target(t)
        min_score = int(RNG.integers(-1500, 60 * Q))
        nat = oracle._native_align_multi(qb, t.encode(), qm, tm, scorer, min_score)
        S = oracle.dp_matrix(qm, tm, scorer)
        final = S[Q]
        ref = []
        for j in np.nonzero(final[1:] >= min_score)[0] + 1:
            ts, cig = oracle.traceback(S, qm, tm, scorer, int(j))
            ref.append((ts, int(j), str(cig), int(final[j])))
        got = [
            (a.target_start, a.target_end, str(a.cigar), a.score) for a in nat
        ]
        assert got == ref, f"trial {trial}: native != numpy"


def test_native_grow_retry():
    # Force the hit buffer to overflow and regrow: tiny min_score means an
    # alignment per end column.
    scorer = derive_scorer()
    query = "ACGT"
    qm = encode_query(query)
    t = "ACGT" * 100
    tm = encode_target(t)
    alns = oracle._native_align_multi(
        query.encode(), t.encode(), qm, tm, scorer, -(10**6)
    )
    assert len(alns) == len(t)  # one per end column


def test_native_full_pass_matches_python_engine():
    """The C++ search_pass path must produce alignments identical to the
    Python DP+extension path across random guides/targets/limits."""
    from calitas_tpu.core.guide import Guide
    from calitas_tpu.align.engine import SequentialAligner

    al = SequentialAligner()
    rng = np.random.default_rng(23)
    for trial in range(60):
        Q = int(rng.integers(10, 24))
        proto = "".join(rng.choice(list("ACGT"), Q))
        style = trial % 4
        if style == 0:
            guide = Guide.parse(proto)  # PAM-less
        elif style == 1:
            guide = Guide.parse(proto + "nrg")
        elif style == 2:
            guide = Guide.parse("tttv" + proto)  # 5' PAM
        else:
            guide = Guide.parse(proto + "nrg", aux_pams=["ntg", "nn"])
        T = int(rng.integers(Q + 5, 400))
        target = "".join(rng.choice(list("ACGTN"), T))
        if rng.random() < 0.7:  # plant a mutated site
            pos = int(rng.integers(0, T - Q - 4))
            site = list(proto)
            for _ in range(int(rng.integers(0, 4))):
                site[int(rng.integers(0, Q))] = rng.choice(list("ACGT"))
            target = target[:pos] + "".join(site) + "TGG" + target[pos + Q + 3:]
        kw = dict(
            max_guide_diffs=int(rng.integers(0, 6)),
            max_gaps_between_guide_and_pam=int(rng.integers(0, 4)),
            max_pam_diffs=int(rng.integers(0, 3)),
            max_overlap=int(rng.integers(0, 12)),
        )
        kw["max_total_diffs"] = int(
            rng.integers(0, kw["max_guide_diffs"] + kw["max_pam_diffs"] + 4)
        )
        got = al.align(guide, target, **kw)
        # Force the pure-Python path by precomputing DP results.
        from calitas_tpu.align.oracle import glocal_align_multi
        from calitas_tpu.core.sequence import (
            encode_query, encode_target, revcomp, revcomp_bytes,
        )

        min_score = al.min_guide_score(guide, kw["max_guide_diffs"])
        tgt_b = target.encode()
        rc_b = bytes(revcomp_bytes(np.frombuffer(tgt_b, np.uint8)))
        dp_query = (guide.guide_rc if guide.pam_is_5prime else guide.guide_fw).encode()
        fwd_tgt = rc_b if guide.pam_is_5prime else tgt_b
        rev_tgt = tgt_b if guide.pam_is_5prime else rc_b
        pre = {
            "fwd": glocal_align_multi(
                dp_query, fwd_tgt, encode_query(dp_query),
                encode_target(fwd_tgt), al.scorer, min_score,
            ),
            "rev": glocal_align_multi(
                dp_query, rev_tgt, encode_query(dp_query),
                encode_target(rev_tgt), al.scorer, min_score,
            ),
        }
        want = al.align(guide, target, precomputed=pre, **kw)
        key = lambda a: (
            a.strand, a.start_offset, a.end_offset, a.guide_start_offset,
            a.guide_end_offset, a.score, str(a.cigar), a.guide,
            a.padded_guide, a.padded_alignment, a.padded_target,
        )
        assert [key(a) for a in got] == [key(a) for a in want], f"trial {trial}"
