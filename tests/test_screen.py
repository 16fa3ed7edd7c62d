"""Device DP screen vs exact oracle: the kernel parity contract.

The screen must compute, bit-exactly, the final DP row the oracle
computes — no false negatives, no false positives at the score level."""

import numpy as np
import pytest

from calitas_tpu.core.scoring import derive_scorer
from calitas_tpu.core.sequence import encode_query, encode_target
from calitas_tpu.align.oracle import dp_matrix
from calitas_tpu.ops.dp_screen import ScreenKernel

RNG = np.random.default_rng(42)
BASES = np.frombuffer(b"ACGTN", dtype=np.uint8)


def random_seq(n, with_n=False):
    pool = BASES if with_n else BASES[:4]
    return RNG.choice(pool, size=n).tobytes().decode()


@pytest.fixture(scope="module")
def scorer():
    return derive_scorer()


class TestScreenEquivalence:
    def test_final_rows_match_oracle(self, scorer):
        Q, T, B = 20, 64, 8
        query = random_seq(Q)
        qmask = encode_query(query)
        targets = [random_seq(T, with_n=True) for _ in range(B)]
        tmasks = np.stack([encode_target(t) for t in targets])
        kernel = ScreenKernel(scorer)
        rows = kernel.final_rows(qmask, tmasks)
        for b, t in enumerate(targets):
            S = dp_matrix(qmask, encode_target(t), scorer)
            np.testing.assert_array_equal(rows[b], S[Q, 1:])

    def test_max_scores_with_planted_hit(self, scorer):
        query = "CTTGCCCCACAGGGCAGTAA"
        qmask = encode_query(query)
        clean = random_seq(100)
        planted = clean[:40] + query + clean[60:]
        tmasks = np.stack([encode_target(clean), encode_target(planted)])
        lengths = np.array([100, 100], dtype=np.int32)
        kernel = ScreenKernel(scorer)
        best = kernel.max_scores(qmask, tmasks, lengths)
        perfect = scorer.match_score * len(query)
        assert best[1] == perfect
        assert best[0] < perfect

    def test_length_masking(self, scorer):
        # End columns beyond the window length must not contribute.
        query = "ACGTACGTAC"
        qmask = encode_query(query)
        t = "TTTTTTTTTT" + query  # hit only at the very end
        tmask = encode_target(t)
        padded = np.zeros((1, 32), dtype=np.uint8)
        padded[0, : len(t)] = tmask
        kernel = ScreenKernel(scorer)
        full = kernel.max_scores(qmask, padded, np.array([len(t)], np.int32))
        cut = kernel.max_scores(qmask, padded, np.array([10], np.int32))
        assert full[0] == scorer.match_score * len(query)
        assert cut[0] < full[0]

    def test_random_fuzz_vs_oracle(self, scorer):
        kernel = ScreenKernel(scorer)
        for trial in range(10):
            Q = int(RNG.integers(8, 30))
            T = int(RNG.integers(Q, 120))
            query = random_seq(Q)
            target = random_seq(T, with_n=True)
            qmask = encode_query(query)
            tmask = encode_target(target)
            S = dp_matrix(qmask, tmask, scorer)
            padded = np.zeros((1, 128), dtype=np.uint8)
            padded[0, :T] = tmask
            best = kernel.max_scores(qmask, padded, np.array([T], np.int32))
            assert best[0] == S[Q, 1:].max()
