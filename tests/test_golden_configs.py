"""Golden-table regression: the benchmark configs' output tables are
pinned fixtures (benchmarks/golden/), asserted modulo the two
run-varying columns (time_stamp, aligner_version-with-git-sha).

These tables double as the JAR-parity oracles: BASELINE.md's protocol is
to diff them against the reference JAR's output (benchmarks/vs_jar.py;
tests/test_vs_jar.py runs it when a JVM/JAR is available).

Configs 1-2 run always (seconds); 3/4/5s are genome-scale and run under
``CALITAS_SOAK=1`` like the other soaks.
"""

import gzip
import importlib.util
import os
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
GOLDEN = ROOT / "benchmarks" / "golden"

SOAK = os.environ.get("CALITAS_SOAK") == "1"


@pytest.fixture()
def configs(tmp_path):
    """Import benchmarks/run_configs.py with its output dir redirected."""
    spec = importlib.util.spec_from_file_location(
        "run_configs", ROOT / "benchmarks" / "run_configs.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.OUT = tmp_path
    return mod


def norm_rows(text: str) -> list[tuple]:
    """Rows with the run-varying columns blanked."""
    lines = text.splitlines()
    hdr = lines[0].split("\t")
    varying = [
        i for i, c in enumerate(hdr) if c in ("time_stamp", "aligner_version")
    ]
    out = [tuple(hdr)]
    for l in lines[1:]:
        f = l.split("\t")
        for i in varying:
            f[i] = ""
        out.append(tuple(f))
    return out


def golden(name: str) -> str:
    gz = GOLDEN / (name + ".gz")
    if gz.exists():
        return gzip.decompress(gz.read_bytes()).decode()
    return (GOLDEN / name).read_text()


def assert_matches_golden(produced: Path, name: str):
    got = norm_rows(produced.read_text())
    want = norm_rows(golden(name))
    assert len(got) == len(want), f"{name}: {len(got)} rows vs {len(want)}"
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"{name} row {i} drifted:\n got: {g}\nwant: {w}"


def test_config1_pairwise_golden(configs, tmp_path):
    configs.config1()
    assert_matches_golden(tmp_path / "config1.txt", "config1.txt")


def test_config2_a2r_golden(configs, tmp_path):
    configs.config2()
    assert_matches_golden(tmp_path / "config2.txt", "config2.txt")


@pytest.mark.skipif(not SOAK, reason="CALITAS_SOAK=1 to run genome-scale goldens")
def test_config3_search_golden(configs, tmp_path):
    configs.config3()
    assert_matches_golden(tmp_path / "config3.txt", "config3.txt")


@pytest.mark.skipif(not SOAK, reason="CALITAS_SOAK=1 to run genome-scale goldens")
def test_config4_variants_golden(configs, tmp_path):
    configs.config4()
    assert_matches_golden(tmp_path / "config4.txt", "config4.txt")


@pytest.mark.skipif(not SOAK, reason="CALITAS_SOAK=1 to run genome-scale goldens")
def test_config5s_multiguide_golden(configs, tmp_path):
    configs.config5s()
    assert_matches_golden(tmp_path / "config5s.txt", "config5s.txt")
