from calitas_tpu.align.alignment import Alignment, padded_strings
from calitas_tpu.align.guide_alignment import GuideAlignment
from calitas_tpu.align.engine import SequentialAligner

__all__ = ["Alignment", "padded_strings", "GuideAlignment", "SequentialAligner"]
