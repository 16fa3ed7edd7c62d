"""Batches genome windows onto the device DP screen and finishes hits on
the host.

The TPU-first execution strategy for SearchReference (SURVEY.md §2.10,
§7): windows are packed into fixed-shape [B, T] uint8 mask batches (both
strands), screened on device with the exact int32 DP, and only windows
whose best end-column score reaches the guide-only minimum get the full
host alignment (traceback, PAM extension, dedup).  Output is therefore
bit-identical to the host-only path.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import numpy as np

from calitas_tpu.core.guide import Guide
from calitas_tpu.core.sequence import TARGET_MASK_TABLE, revcomp_bytes
from calitas_tpu.align.engine import SequentialAligner
from calitas_tpu.align.guide_alignment import GuideAlignment
from calitas_tpu.ops.dp_screen import ScreenKernel
from calitas_tpu.search.windows import RefWindow

DEFAULT_BATCH = 512


def screened_window_results(
    windows: Iterable[RefWindow],
    guide: Guide,
    aligner: SequentialAligner,
    *,
    batch_size: int = DEFAULT_BATCH,
    pad_to: Optional[int] = None,
    kernel: Optional[ScreenKernel] = None,
    **align_kwargs,
) -> Iterator[tuple[RefWindow, list[GuideAlignment]]]:
    """Yield (window, alignments) for every window that produces hits.

    ``align_kwargs`` are the limits passed to ``SequentialAligner.align``.
    """
    kernel = kernel or ScreenKernel(aligner.scorer)
    min_score = aligner.min_guide_score(guide, align_kwargs["max_guide_diffs"])

    # The DP query per the reference's orientation trick (§2.3): for
    # 5'-PAM guides align revcomp(guide); targets fw+rc either way.
    query = guide.guide_rc if guide.pam_is_5prime else guide.guide_fw
    from calitas_tpu.core.sequence import encode_query

    qmask = encode_query(query)

    for batch in _batched(windows, batch_size):
        # Fixed shapes (pad both T and B) so the jitted screen compiles once.
        T = pad_to or max(len(w.bases) for w in batch)
        B = batch_size
        tmasks = np.zeros((2 * B, T), dtype=np.uint8)
        lengths = np.zeros(2 * B, dtype=np.int32)
        for i, w in enumerate(batch):
            masks = TARGET_MASK_TABLE[w.bases]
            L = len(masks)
            tmasks[i, :L] = masks
            # revcomp strand: mask of revcomp = reverse of complement masks;
            # complement of a 4-bit mask swaps A<->T and C<->G bits
            tmasks[B + i, :L] = _rc_masks(masks)
            lengths[i] = lengths[B + i] = L
        best = kernel.max_scores(qmask, tmasks, lengths)
        hit_rows = best >= min_score
        for i, w in enumerate(batch):
            if hit_rows[i] or hit_rows[B + i]:
                results = aligner.align(
                    guide,
                    w.bases,
                    target_name=w.chrom,
                    target_offset=w.start - 1,
                    **align_kwargs,
                )
                if results:
                    yield w, results


_RC_MASK_TABLE = np.zeros(16, dtype=np.uint8)
for _m in range(16):
    _r = 0
    if _m & 1:  # A -> T
        _r |= 8
    if _m & 2:  # C -> G
        _r |= 4
    if _m & 4:  # G -> C
        _r |= 2
    if _m & 8:  # T -> A
        _r |= 1
    _RC_MASK_TABLE[_m] = _r


def _rc_masks(masks: np.ndarray) -> np.ndarray:
    return _RC_MASK_TABLE[masks][::-1]


def _batched(it: Iterable[RefWindow], n: int) -> Iterator[list[RefWindow]]:
    buf: list[RefWindow] = []
    for w in it:
        buf.append(w)
        if len(buf) == n:
            yield buf
            buf = []
    if buf:
        yield buf
