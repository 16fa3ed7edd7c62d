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
