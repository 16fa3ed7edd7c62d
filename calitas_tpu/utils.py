"""Small shared utilities."""

from __future__ import annotations

import re


def camel_to_gnu(name: str) -> str:
    """camelCase -> gnu-style-option-name (fgbio StringUtil.camelToGnu, used
    for the aligner_other_parameters column, SearchReference.scala:496-508)."""
    return re.sub(r"(?<!^)(?=[A-Z])", "-", name).lower()


def core_parameters(params: dict[str, object]) -> str:
    """Sorted, ';'-joined, GNU-cased key=value parameter string
    (SearchReference.scala:496-508).  ``None`` values render as Scala
    ``Option`` toString does in the reference AlignToReference tool
    ('None' / 'Some(x)')."""
    items = []
    for k, v in params.items():
        items.append(f"{camel_to_gnu(k)}={_scala_repr(v)}")
    return ";".join(sorted(items))


def _scala_repr(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def scala_option_repr(v) -> str:
    """Render an optional value the way Scala's Option.toString does —
    AlignToReference interpolates Option values directly into its
    parameter string (AlignToReference.scala:77-86)."""
    return "None" if v is None else f"Some({v})"
