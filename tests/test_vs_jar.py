"""JAR-differential tests: when a reference CALITAS CLI is available
(CALITAS_JAR / CALITAS_CMD / bioconda `calitas`), every tool's table
must match it row-for-row modulo time_stamp/aligner_version
(BASELINE.md protocol).  Skipped in JVM-less environments; the
transcribed reference test suite + golden tables stand in there.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
spec = importlib.util.spec_from_file_location("vs_jar", ROOT / "benchmarks" / "vs_jar.py")
vs_jar = importlib.util.module_from_spec(spec)
spec.loader.exec_module(vs_jar)

pytestmark = pytest.mark.skipif(
    vs_jar.reference_cmd() is None,
    reason="no reference CALITAS CLI (set CALITAS_JAR or install calitas)",
)


@pytest.fixture()
def small_ref(tmp_path):
    from calitas_tpu.core.sequence import revcomp
    from calitas_tpu.io.fasta import ReferenceSetBuilder

    rng = np.random.default_rng(17)
    proto = "CTTGCCCCACAGGGCAGTAA"
    seq = list("".join(rng.choice(list("ACGT"), 200_000)))
    for k in range(10):
        pos = 5_000 + 18_000 * k
        site = list(proto)
        for _ in range(k % 4):
            i = int(rng.integers(0, 20))
            site[i] = rng.choice([c for c in "ACGT" if c != site[i]])
        s = "".join(site) + "TGG"
        if k % 2:
            s = revcomp(s)
        seq[pos : pos + len(s)] = list(s)
    b = ReferenceSetBuilder(assembly="vsjar")
    b.add("chr1").add("".join(seq))
    return b.to_file(tmp_path / "ref.fa")


def test_search_reference_matches_jar(small_ref):
    rc = vs_jar.run_differential(
        "SearchReference",
        ["-i", "CTTGCCCCACAGGGCAGTAAnrg", "-I", "g", "-r", str(small_ref),
         "-d", "4", "-p", "1"],
    )
    assert rc == 0


def test_pairwise_matches_jar(tmp_path):
    from calitas_tpu.core.sequence import revcomp

    rng = np.random.default_rng(23)
    proto = "CTTGCCCCACAGGGCAGTAA"
    inp = tmp_path / "pairs.txt"
    with open(inp, "w") as fh:
        for i in range(25):
            t = list("".join(rng.choice(list("ACGT"), 60)))
            site = proto + "TGG"
            if i % 2:
                site = revcomp(site)
            t[10 : 10 + len(site)] = list(site)
            fh.write(f"{proto}nrg\t{''.join(t)}\n")
    rc = vs_jar.run_differential("PairwiseAlignSequences", ["-i", str(inp)])
    assert rc == 0
