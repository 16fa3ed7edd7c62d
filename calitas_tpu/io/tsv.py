"""Metric-style TSV serialization.

Mirrors the fgbio ``Metric`` contract the reference relies on
(SURVEY.md §2.9.6): header row of field names in declaration order,
tab-separated values, ``Option`` ``None`` rendered as the empty string.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import IO, Iterable, Iterator, Type, TypeVar

T = TypeVar("T")


def format_value(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _format_float(v)
    return str(v)


def _format_float(v: float) -> str:
    # Scala's Double.toString renders 0.5 -> "0.5", 1.0 -> "1.0"; Python's
    # str matches for the value ranges we emit (allele frequencies).
    return str(v)


def fields_of(cls) -> list[str]:
    return [f.name for f in dataclasses.fields(cls)]


class MetricWriter:
    """Writes dataclass rows as a TSV with a header."""

    def __init__(self, out: IO[str] | str | Path, cls):
        self._own = not hasattr(out, "write")
        self._fh: IO[str] = open(out, "w") if self._own else out  # type: ignore[arg-type]
        self._fields = fields_of(cls)
        self._fh.write("\t".join(self._fields) + "\n")

    def write(self, row) -> None:
        vals = [format_value(getattr(row, f)) for f in self._fields]
        self._fh.write("\t".join(vals) + "\n")

    def write_all(self, rows: Iterable) -> None:
        for r in rows:
            self.write(r)

    def close(self) -> None:
        if self._own:
            self._fh.close()
        else:
            self._fh.flush()


def open_output(path: str | Path | None) -> IO[str]:
    """'-'/None -> stdout (reference default Io.StdOut)."""
    if path is None or str(path) in ("-", "/dev/stdout"):
        return sys.stdout
    return open(path, "w")


def read_metrics(path: str | Path, cls: Type[T]) -> list[T]:
    """Read a metric TSV back into dataclass instances (fgbio
    ``Metric.read`` equivalent, used by tests)."""
    hints = {f.name: f.type for f in dataclasses.fields(cls)}
    rows: list[T] = []
    with open(path) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        for line in fh:
            vals = line.rstrip("\n").split("\t")
            kw = {}
            for name, raw in zip(header, vals):
                kw[name] = _parse(raw, hints.get(name, "str"))
            rows.append(cls(**kw))
    return rows


def _parse(raw: str, hint) -> object:
    h = str(hint)
    optional = "Optional" in h or "None" in h
    if raw == "" and optional:
        return None
    if "int" in h:
        return int(raw)
    if "float" in h:
        return float(raw)
    return raw
