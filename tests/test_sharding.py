"""Multi-device sharding tests on the virtual 8-device CPU mesh:
shard-merge equality with single-device output (SURVEY.md §4's
multi-host test requirement)."""

import numpy as np
import pytest

from calitas_tpu.core.scoring import derive_scorer
from calitas_tpu.core.sequence import revcomp


@pytest.fixture(scope="module")
def mesh8():
    import jax

    try:
        devices = jax.devices("cpu")
    except Exception:
        devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 devices (set xla_force_host_platform_device_count)")
    from calitas_tpu.parallel.mesh import make_mesh

    return make_mesh(8, devices=devices)


class TestShardedScreen:
    def test_flags_match_single_device(self, mesh8):
        from calitas_tpu.ops.genome_screen import GenomeScreen, ShardedGenomeScreen

        rng = np.random.default_rng(2)
        guide = "CTTGCCCCACAGGGCAGTAA"
        contig = "".join(rng.choice(list("ACGT"), 60_000))
        contig = contig[:5000] + guide + contig[5000 + len(guide) :]
        bases = np.frombuffer(contig.encode(), dtype=np.uint8)
        scorer = derive_scorer()

        single = GenomeScreen(scorer, window=1000, batch_windows=512, use_pallas=False)
        f1 = single.screen_contig(
            single.stage(bases), len(bases), 970, guide, revcomp(guide), 590
        )
        sharded = ShardedGenomeScreen(
            scorer, mesh8, window=1000, batch_windows=512, use_pallas=False
        )
        f2 = sharded.screen_contig(
            sharded.stage(bases), len(bases), 970, guide, revcomp(guide), 590
        )
        assert np.array_equal(f1, f2)
        assert f1.any()

    def test_mesh_psum_hit_count(self, mesh8):
        from calitas_tpu.core.sequence import encode_query, encode_target
        from calitas_tpu.parallel.mesh import screen_on_mesh

        scorer = derive_scorer()
        rng = np.random.default_rng(0)
        Q, B, T = 12, 32, 64
        query = "ACGTACGTACGT"
        qmask = encode_query(query)
        tmasks = rng.integers(1, 15, size=(B, T), dtype=np.uint8)
        tmasks[5, 3 : 3 + Q] = qmask
        lengths = np.full(B, T, np.int32)
        best, total = screen_on_mesh(
            mesh8, scorer, qmask, tmasks, lengths, scorer.match_score * Q
        )
        assert best[5] == scorer.match_score * Q
        assert total >= 1
