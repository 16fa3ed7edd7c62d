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


class TestPallasKernelsInterpret:
    """Pallas kernels in interpreter mode (CPU CI coverage)."""

    def test_v2_matches_oracle(self, scorer):
        from calitas_tpu.ops.dp_pallas2 import PallasScreenKernelV2

        Q, T, B = 12, 64, 1024  # one grid cell
        query = random_seq(Q)
        qmask = encode_query(query)
        tmasks = RNG.integers(0, 15, size=(B, T), dtype=np.uint8)
        tmasks[5, 10 : 10 + Q] = qmask
        lengths = np.full(B, T, np.int32)
        k = PallasScreenKernelV2(scorer, interpret=True)
        best = k.max_scores(qmask, tmasks, lengths)
        for b in [0, 5, 1023]:
            S = dp_matrix(qmask, tmasks[b], scorer)
            assert best[b] == S[Q, 1:].max()

    def test_dual_matches_two_singles(self, scorer):
        import jax.numpy as jnp

        from calitas_tpu.core.sequence import revcomp
        from calitas_tpu.ops.dp_pallas2 import (
            LANES,
            PallasScreenKernelV2,
            _pallas_screen_dual,
        )

        Q, T, B = 10, 48, 1024
        query = random_seq(Q)
        qmask = encode_query(query)
        qmask_rc = encode_query(revcomp(query))
        tmasks = RNG.integers(0, 15, size=(B, T), dtype=np.uint8)
        lengths = np.full(B, T, np.int32)
        k = PallasScreenKernelV2(scorer, interpret=True)
        s_fw = k.max_scores(qmask, tmasks, lengths)
        s_rc = k.max_scores(qmask_rc, tmasks, lengths)
        qv2 = np.stack([qmask, qmask_rc]).astype(np.int32)
        tcols = tmasks.T.astype(np.int32).reshape(T, B // LANES, LANES)
        dual = np.asarray(
            _pallas_screen_dual(
                jnp.asarray(qv2), jnp.asarray(tcols),
                Q=Q, match=scorer.match_score, mismatch=scorer.mismatch_score,
                qgap=scorer.query_gap_score, tgap=scorer.target_gap_score,
                interpret=True,
            )
        ).reshape(-1)
        np.testing.assert_array_equal(dual, np.maximum(s_fw, s_rc))

    def test_v1_wavefront_matches_oracle(self, scorer):
        from calitas_tpu.ops.dp_pallas import PallasScreenKernel

        Q, T, B = 14, 40, 128
        query = random_seq(Q)
        qmask = encode_query(query)
        tmasks = RNG.integers(0, 15, size=(B, T), dtype=np.uint8)
        lengths = np.full(B, T, np.int32)
        k = PallasScreenKernel(scorer, interpret=True)
        best = k.max_scores(qmask, tmasks, lengths)
        for b in [0, 64, 127]:
            S = dp_matrix(qmask, tmasks[b], scorer)
            assert best[b] == S[Q, 1:].max()
