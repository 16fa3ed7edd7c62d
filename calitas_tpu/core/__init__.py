from calitas_tpu.core.sequence import (
    IUPAC_MASK,
    compatible,
    complement_char,
    encode_query,
    encode_target,
    revcomp,
    revcomp_bytes,
)
from calitas_tpu.core.cigar import Cigar, CigarElem
from calitas_tpu.core.scoring import Defaults, Scorer, derive_scorer
from calitas_tpu.core.guide import Guide

__all__ = [
    "IUPAC_MASK",
    "compatible",
    "complement_char",
    "encode_query",
    "encode_target",
    "revcomp",
    "revcomp_bytes",
    "Cigar",
    "CigarElem",
    "Defaults",
    "Scorer",
    "derive_scorer",
    "Guide",
]
