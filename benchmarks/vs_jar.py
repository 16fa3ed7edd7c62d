"""Differential harness against the reference CALITAS JAR.

BASELINE.md's protocol: run the reference implementation on the same
inputs and diff the output tables modulo run-varying columns.  No JVM
exists in the build environment, so this harness activates only when one
of the following resolves (checked in order):

1. ``CALITAS_JAR`` env var — path to a prebuilt ``calitas.jar``
   (build: ``sbt clean assembly`` in the reference checkout →
   ``calitas/target/scala-2.12/calitas.jar``, /root/reference/README.md:40-48)
   run as ``java -Xmx8g -jar $CALITAS_JAR`` (heap per README.md:23-27).
2. ``CALITAS_CMD`` env var — full command prefix for the reference CLI.
3. A ``calitas`` executable on PATH (the Bioconda release wrapper).

Usage:
    python benchmarks/vs_jar.py SearchReference -i GUIDEnrg -I id -r ref.fa ...

Runs BOTH implementations with the given sub-command + args (appending
``-o`` per side), diffs the tables, and exits non-zero on any row drift.
``tests/test_vs_jar.py`` drives the same functions and skips when no
reference CLI is available.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

#: Columns that legitimately differ between implementations/runs.
RUN_VARYING = ("time_stamp", "aligner_version")


def reference_cmd() -> list[str] | None:
    """Command prefix for the reference CALITAS CLI, or None."""
    jar = os.environ.get("CALITAS_JAR")
    if jar and Path(jar).exists() and shutil.which("java"):
        return ["java", "-Xmx8g", "-jar", jar]
    cmd = os.environ.get("CALITAS_CMD")
    if cmd:
        return cmd.split()
    exe = shutil.which("calitas")
    if exe:
        return [exe]
    return None


def normalize_table(path: str | Path) -> list[tuple]:
    """Table rows with run-varying columns blanked (header kept)."""
    lines = Path(path).read_text().splitlines()
    if not lines:
        return []
    hdr = lines[0].split("\t")
    varying = [i for i, c in enumerate(hdr) if c in RUN_VARYING]
    rows = [tuple(hdr)]
    for l in lines[1:]:
        f = l.split("\t")
        for i in varying:
            if i < len(f):
                f[i] = ""
        rows.append(tuple(f))
    return rows


def diff_tables(ours: str | Path, theirs: str | Path) -> list[str]:
    """Human-readable drift lines (empty = tables match)."""
    a = normalize_table(ours)
    b = normalize_table(theirs)
    out: list[str] = []
    if a and b and a[0] != b[0]:
        out.append(f"header drift:\n ours:   {a[0]}\n theirs: {b[0]}")
    if len(a) != len(b):
        out.append(f"row count: ours={len(a) - 1} theirs={len(b) - 1}")
    for i, (x, y) in enumerate(zip(a[1:], b[1:]), 1):
        if x != y:
            out.append(f"row {i}:\n ours:   {x}\n theirs: {y}")
            if len(out) > 20:
                out.append("... (truncated)")
                break
    return out


def run_differential(subcommand: str, args: list[str]) -> int:
    ref_cmd = reference_cmd()
    if ref_cmd is None:
        print(
            "No reference CALITAS CLI available (set CALITAS_JAR / "
            "CALITAS_CMD or install the bioconda `calitas` wrapper).",
            file=sys.stderr,
        )
        return 2
    with tempfile.TemporaryDirectory() as td:
        ours = Path(td) / "ours.txt"
        theirs = Path(td) / "theirs.txt"
        subprocess.run(
            [sys.executable, "-m", "calitas_tpu", subcommand, *args,
             "-o", str(ours)],
            check=True,
        )
        subprocess.run(
            [*ref_cmd, subcommand, *args, "-o", str(theirs)], check=True
        )
        drift = diff_tables(ours, theirs)
    if drift:
        print("\n".join(drift), file=sys.stderr)
        print(f"FAIL: {len(drift)} drift record(s).", file=sys.stderr)
        return 1
    print("OK: tables identical modulo", ", ".join(RUN_VARYING))
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    raise SystemExit(run_differential(sys.argv[1], sys.argv[2:]))
