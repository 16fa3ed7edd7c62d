"""Device-resident genome screening.

The production SearchReference path: the contig's IUPAC-mask array is
staged to device HBM **once**; window extraction, layout transposition,
and the DP screen all run on device inside a single dispatch that loops
over window batches.  Only the per-window best scores (4 bytes/window)
return to the host.  This eliminates per-batch host->device transfers —
the difference between ~0.15 and ~300 Gcells/s on a tunneled TPU.

Strand handling: screening query q against revcomp(window) is equivalent
to screening revcomp(q) against the window (the pairing and gap costs are
side-preserving under joint reversal), so both strands run against the
same device-resident forward genome with two queries.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from calitas_tpu import _enable_jax_compilation_cache

_enable_jax_compilation_cache()
from calitas_tpu.core.scoring import Scorer
from calitas_tpu.core.sequence import TARGET_MASK_TABLE, encode_query
from calitas_tpu.ops.dp_pallas2 import LANES, BLOCK_W


def range_block(window: int) -> int:
    """Column width of one coarse end-column range block at this window.

    Ranges travel as one (min_block, max_block) uint8 pair per chain per
    window, so the block width is the smallest power-of-two multiple of 8
    with ``window <= 256 * block``: 8 columns up to ``-w 2048``, then
    16/32/64/... doubling without bound — 256 blocks cover ANY window
    width, so ranges (and the sliced native finish they enable) stay on
    at every legal ``-w`` (SearchReference.scala:460 accepts any window
    size).  A coarser block only widens
    the host finish's DP column slice (by < block columns per side),
    never its correctness — the widened slice is always a superset of the
    qualifying end columns."""
    rb = 8
    while window > rb * 256:
        rb *= 2
    return rb


def _pad_genome(genome_dev, need: int):
    """Zero-pad the staged genome to a power-of-two >= ``need`` (zero
    mask = mismatch-everything pad; the bucketed length keeps one
    compilation across contigs)."""
    if need <= genome_dev.shape[0]:
        return genome_dev
    need = 1 << (need - 1).bit_length()
    return jnp.concatenate(
        [genome_dev, jnp.zeros(need - genome_dev.shape[0], jnp.uint8)]
    )


def _static_pam_spec(pam_spec, use_pallas: bool):
    """Hashable (encoded-PAM, max_mm, max_gap) static arg for the jitted
    screens, or None when the gate is off (no PAMs / XLA path)."""
    if pam_spec is None or not use_pallas:
        return None
    pams, max_pam_mm, max_gap = pam_spec
    if not pams or any(len(p) == 0 for p in pams):
        return None
    return (
        tuple(tuple(int(m) for m in encode_query(p)) for p in pams),
        int(max_pam_mm),
        int(max_gap),
    )


def default_device_platform() -> str:
    """Platform of the device computations will actually land on —
    honors ``jax_default_device`` (tests pin it to CPU)."""
    dev = jax.config.jax_default_device
    if dev is None:
        dev = jax.devices()[0]
    return dev.platform


def extract_window_grid(genome, base, n_windows: int, step: int, window: int):
    """Windows at the regular grid base + i*step, i in [0, n_windows), as a
    [n_windows, window] array — built from contiguous reshapes, NOT a
    gather (TPU gathers run ~1000x below memcpy speed).

    Works whenever window <= 2*step (the search default: overlap ~6% of
    the window).  Row i of reshape(genome[base:base+n*step], (n, step)) is
    genome[base+i*step : base+(i+1)*step); the remaining window-step
    columns continue at base+step+i*step, i.e. row i of the same reshape
    shifted by one step.
    """
    if window <= step:
        flat = jax.lax.dynamic_slice(genome, (base,), (n_windows * step,))
        return flat.reshape(n_windows, step)[:, :window]
    if window <= 2 * step:
        a = jax.lax.dynamic_slice(genome, (base,), (n_windows * step,)).reshape(
            n_windows, step
        )
        b = jax.lax.dynamic_slice(
            genome, (base + step,), (n_windows * step,)
        ).reshape(n_windows, step)[:, : window - step]
        return jnp.concatenate([a, b], axis=1)
    # Fallback: the general (slow) gather.
    starts = base + jnp.arange(n_windows) * step
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(genome, (s,), (window,))
    )(starts)


def _pam_bit_planes(wins, pam_spec):
    """Per-column PAM-compatibility bits for a window batch.

    pam_spec = (pams, max_pam_mm, max_gap) with pams a tuple of
    DP-orientation PAM mask tuples.  Returns (end_ok, start_ok) uint8
    planes: end_ok[:, j] - some PAM fits (<= max_pam_mm mismatches) at one
    of the gap offsets right after an alignment ending at column j;
    start_ok[:, j] - some revcomp'd PAM fits right before an alignment
    starting at column j+1.  Out-of-window bases count as mismatches,
    which matches the reference (its windows end where ours do).
    """
    pams, max_mm, max_gap = pam_spec
    bw, T = wins.shape
    max_plen = max(len(p) for p in pams)
    pad = max_gap + max_plen + 2
    w = jnp.pad(wins, ((0, 0), (pad, pad)))
    end_ok = jnp.zeros((bw, T), jnp.bool_)
    start_ok = jnp.zeros((bw, T), jnp.bool_)
    for pam in pams:
        plen = len(pam)
        rc_pam = tuple(_rc_mask(m) for m in reversed(pam))
        for o in range(max_gap + 1):
            mm_e = jnp.zeros((bw, T), jnp.int32)
            mm_s = jnp.zeros((bw, T), jnp.int32)
            for k in range(plen):
                # end gate: PAM base k at 0-based window index j+1+o+k
                sl_e = jax.lax.dynamic_slice_in_dim(w, pad + 1 + o + k, T, 1)
                mm_e = mm_e + ((sl_e & np.uint8(pam[k])) == 0)
                # start gate: rc(PAM) base k at index j - o - plen + 1 + k
                sl_s = jax.lax.dynamic_slice_in_dim(
                    w, pad - o - plen + 1 + k, T, 1
                )
                mm_s = mm_s + ((sl_s & np.uint8(rc_pam[k])) == 0)
            end_ok = end_ok | (mm_e <= max_mm)
            start_ok = start_ok | (mm_s <= max_mm)
    return end_ok.astype(jnp.uint8), start_ok.astype(jnp.uint8)


def _pack_flag_bits(flags):
    """Pack a [..., N] boolean/int array into [..., N//8] uint8 bitmasks
    (bit k = element k, little-endian).  The screen's host-visible output:
    flags are 32x smaller than int32 maxima, which matters both for D2H
    bandwidth and for tunneled dev links."""
    b = flags.astype(jnp.uint8).reshape(*flags.shape[:-1], -1, 8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return (b * weights).sum(axis=-1).astype(jnp.uint8)


def _unpack_flag_bits(packed: np.ndarray, n: int) -> np.ndarray:
    """Host-side inverse of :func:`_pack_flag_bits`, trimmed to n flags."""
    flat = np.unpackbits(packed, axis=-1, bitorder="little")
    return flat[..., :n].astype(bool)


def _encode_block(u):
    """The IUPAC select chain on a case-folded block (see _encode_staged)."""
    from calitas_tpu.core.sequence import IUPAC_MASK

    m = jnp.zeros_like(u)
    for ch, mask in IUPAC_MASK.items():
        if ch == "N":
            continue  # target N -> 0 (always mismatch)
        m = jnp.where(u == jnp.uint8(ord(ch)), jnp.uint8(mask), m)
    return m


_ENCODE_CHUNK = 1 << 22  # 4 MB per loop step: keeps per-op shapes small


@jax.jit
def _encode_staged(raw):
    """Raw contig bytes -> 4-bit IUPAC target masks, on device.

    Equivalent to ``TARGET_MASK_TABLE[raw]`` (core/sequence.py:50-57:
    case-insensitive, N and unknown bytes -> 0) but computed as an
    arithmetic select chain on the VPU: the host-side 256-entry table
    gather is the single most expensive staging step on low-memory-
    bandwidth hosts, while on device the 15 compares are free next to
    the H2D transfer.  ``x & 0xDF`` folds case (x&0xDF == L iff
    x in {L, L|0x20} for an uppercase letter L, so non-letters can't
    alias).

    Callers zero-pad the raw array on the host (a memset) to a power of
    two — zero bytes encode to mask 0.  Contig-sized (100M+) elementwise
    programs compile pathologically slowly on remote-compile backends,
    so like the screen itself this runs as a fori_loop over fixed-size
    slices: per-op shapes stay small no matter the contig length."""
    n = raw.shape[0]
    if n <= _ENCODE_CHUNK:
        return _encode_block(raw & jnp.uint8(0xDF))
    # n is a power of two > _ENCODE_CHUNK, so it divides evenly.
    n_chunks = n // _ENCODE_CHUNK

    def body(i, out):
        c = jax.lax.dynamic_slice(raw, (i * _ENCODE_CHUNK,), (_ENCODE_CHUNK,))
        m = _encode_block(c & jnp.uint8(0xDF))
        return jax.lax.dynamic_update_slice(out, m, (i * _ENCODE_CHUNK,))

    return jax.lax.fori_loop(0, n_chunks, body, jnp.zeros_like(raw))


@jax.jit
def _unpack_staged(packed):
    """[n/2] uint8 nibble pairs -> [n] uint8 4-bit IUPAC masks, on device
    (element 2i = low nibble of byte i, 2i+1 = high nibble).  Chunked
    like :func:`_encode_staged` so per-op shapes stay small on
    remote-compile backends."""
    n2 = packed.shape[0]

    def block(p):
        return jnp.stack([p & jnp.uint8(15), p >> 4], axis=-1).reshape(-1)

    if n2 <= _ENCODE_CHUNK:
        return block(packed)
    n_chunks = n2 // _ENCODE_CHUNK  # n2 is a power of two > chunk

    def body(i, out):
        c = jax.lax.dynamic_slice(
            packed, (i * _ENCODE_CHUNK,), (_ENCODE_CHUNK,)
        )
        return jax.lax.dynamic_update_slice(
            out, block(c), (i * 2 * _ENCODE_CHUNK,)
        )

    return jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros(2 * n2, jnp.uint8)
    )


def _pack_staging_nibbles(contig_bases: np.ndarray, padded_len: int):
    """Host-side 4-bit packing for staging: encode to IUPAC masks (the
    256-entry table gather runs at memory speed — negligible next to a
    slow link) and pack two masks per byte.  Zero pad -> mask 0."""
    masks = TARGET_MASK_TABLE[contig_bases]
    packed = np.zeros(padded_len // 2, np.uint8)
    h = len(masks) // 2
    m = masks[: 2 * h]
    packed[:h] = m[0::2] | (m[1::2] << 4)
    if len(masks) & 1:
        packed[h] = masks[-1]
    return packed


_LINK_RATE_MBPS: float | None = None
_PACK_RATE_MBPS: float | None = None


def _measured_link_rate_mbps() -> float:
    """One-time H2D link-rate probe (8 MB, after a tiny warmup put)."""
    global _LINK_RATE_MBPS
    if _LINK_RATE_MBPS is None:
        import time

        try:
            jax.device_put(jnp.zeros(1024, jnp.uint8)).block_until_ready()
            probe = np.zeros(8 << 20, np.uint8)
            t0 = time.perf_counter()
            jax.device_put(jnp.asarray(probe)).block_until_ready()
            dt = max(time.perf_counter() - t0, 1e-6)
            _LINK_RATE_MBPS = (len(probe) / 1e6) / dt
        except Exception:
            _LINK_RATE_MBPS = float("inf")  # probe failed: raw path
    return _LINK_RATE_MBPS


def _measured_pack_rate_mbps() -> float:
    """One-time host encode+pack rate probe (8 MB of input bases)."""
    global _PACK_RATE_MBPS
    if _PACK_RATE_MBPS is None:
        import time

        probe = np.full(8 << 20, ord("A"), np.uint8)
        t0 = time.perf_counter()
        _pack_staging_nibbles(probe, 8 << 20)
        dt = max(time.perf_counter() - t0, 1e-6)
        _PACK_RATE_MBPS = (len(probe) / 1e6) / dt
    return _PACK_RATE_MBPS


def _packing_pays() -> bool:
    """Nibble-packing halves H2D bytes at the cost of one host-side
    encode+pack pass: it wins when saved transfer time (N/2 / link)
    exceeds the pack cost (N / pack_rate), i.e. link < pack_rate / 2
    (tunneled dev links run ~10-30 MB/s, PCIe links GB/s)."""
    return _measured_link_rate_mbps() < _measured_pack_rate_mbps() / 2.0


def _rc_mask(m: int) -> int:
    r = 0
    if m & 1:
        r |= 8
    if m & 2:
        r |= 4
    if m & 4:
        r |= 2
    if m & 8:
        r |= 1
    return r


@partial(jax.jit, static_argnames=("pam_spec",))
def annotate_genome_pam(genome, *, pam_spec):
    """One-time per-contig PAM-gate annotation: returns the staged mask
    array with bit 4 = PAM-ok chain-A END at this position and bit 5 =
    PAM-ok chain-B START after it — the same gate bits
    :func:`_pam_bit_planes` computes per window batch, hoisted to a
    single fused pass over the contig (the per-batch planes were the
    dominant pre-kernel cost: ~24 sliced compare+accumulate ops per
    8.4 MB batch).

    Two deliberate differences from the per-batch planes, both strictly
    conservative (supersets, resolved by the exact host alignment):
    per-position fitness is computed ONCE and OR-ed over the gap
    offsets (the per-batch code recomputed the mismatch sum per
    offset), and window edges see the real neighboring genome instead
    of out-of-window-as-mismatch — a window-local gate can only be
    stricter, so staged flags cover every window the batch-local gate
    flags (and every window with actual hits, which is the correctness
    contract; tests/test_screen.py::TestPamGate).

    Chunked like :func:`_encode_staged` so per-op shapes stay small on
    remote-compile backends.  Zero padding annotates to gate-closed
    (a zero mask mismatches every PAM base), matching the per-batch
    planes' treatment of beyond-contig windows."""
    pams, max_mm, max_gap = pam_spec
    L = genome.shape[0]
    pad = max(len(p) for p in pams) + max_gap + 2
    gp = jnp.concatenate(
        [jnp.zeros(pad, jnp.uint8), genome, jnp.zeros(pad, jnp.uint8)]
    )
    C = min(_ENCODE_CHUNK, L)
    n_chunks = L // C  # exact for staged arrays (power-of-two lengths)

    def block(base0):
        base = base0 + pad  # gp index of genome position base0
        ext = C + max_gap
        end = jnp.zeros(C, jnp.bool_)
        start = jnp.zeros(C, jnp.bool_)
        for pam in pams:
            plen = len(pam)
            rc_pam = tuple(_rc_mask(m) for m in reversed(pam))
            # fit_e[t] = PAM fits (<= max_mm mismatches) at genome
            # positions starting j0+1+t; fit_s[t] = revcomp'd PAM fits
            # starting j0 - max_gap - plen + 1 + t.
            mm_e = jnp.zeros(ext, jnp.int32)
            mm_s = jnp.zeros(ext, jnp.int32)
            for k in range(plen):
                se = jax.lax.dynamic_slice(gp, (base + 1 + k,), (ext,))
                mm_e = mm_e + ((se & jnp.uint8(pam[k])) == 0)
                ss = jax.lax.dynamic_slice(
                    gp, (base - max_gap - plen + 1 + k,), (ext,)
                )
                mm_s = mm_s + ((ss & jnp.uint8(rc_pam[k])) == 0)
            fe = mm_e <= max_mm
            fs = mm_s <= max_mm
            for o in range(max_gap + 1):
                # end_ok[j] = OR_o fit_e[j+1+o]; start_ok[j] =
                # OR_o fit_s[j-o-plen+1] (gap-offset max-pools)
                end = end | jax.lax.slice(fe, (o,), (o + C,))
                start = start | jax.lax.slice(
                    fs, (max_gap - o,), (max_gap - o + C,)
                )
        g = jax.lax.dynamic_slice(gp, (base,), (C,))
        return (
            g
            | (end.astype(jnp.uint8) << 4)
            | (start.astype(jnp.uint8) << 5)
        )

    if L == C:
        return block(0)

    def body(i, out):
        return jax.lax.dynamic_update_slice(out, block(i * C), (i * C,))

    out = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros(L, jnp.uint8))
    if L % C:
        # Ragged tail (non-power-of-two caller arrays): recompute the
        # last C positions anchored at the end — the overlapped span
        # gets identical values, so the double write is a no-op.
        out = jax.lax.dynamic_update_slice(out, block(L - C), (L - C,))
    return out


def _screen_grid(
    genome,  # [G] uint8 masks, padded with >= window zeros at the end
    qv_fw,  # [1, Q] int32
    qv_rc,  # [1, Q] int32
    n_batches,  # traced scalar: actual batches to run (<= max_batches)
    min_score,  # traced int32: candidate threshold (applied on device)
    base0,  # traced int32: genome offset of this grid's first window —
    #         0 on a single device; each mesh shard passes its span start
    *,
    window: int,
    step: int,
    batch_windows: int,
    max_batches: int,
    Q: int,
    match: int,
    mismatch: int,
    qgap: int,
    tgap: int,
    use_pallas: bool,
    pam_spec=None,  # (pams: tuple[tuple[int,...]], max_pam_mm, max_gap)
    emit_ranges: bool = False,
    packed_tcols: bool = True,
    pam_staged: bool = False,  # genome already carries the gate bits 4/5
    interpret: bool = False,
):
    """The device batch loop shared by the single-device and mesh-sharded
    screens: extract windows, screen both chains, threshold + bit-pack on
    device.  Returns ([2, total//8] uint8 flags, [2, total, 2] uint8
    coarse ranges — a [2, 1, 2] placeholder when ``emit_ranges`` is off).

    ``packed_tcols`` selects the 4-bytes-per-int32 kernel layout
    (:func:`~calitas_tpu.ops.dp_pallas2.pack_tcols_jax`) whose relayout
    moves 4x fewer bytes than the legacy one-column-per-int32 transpose;
    flags/ranges are bit-identical either way (the packing is lossless).
    """
    kw = dict(Q=Q, match=match, mismatch=mismatch, qgap=qgap, tgap=tgap)
    lens_flat = jnp.full((batch_windows,), window, jnp.int32)
    n_total = max_batches * batch_windows

    def body(b, outs):
        out, out_r = outs
        wins = extract_window_grid(
            genome, base0 + b * batch_windows * step, batch_windows, step,
            window,
        )  # [bw, T] uint8
        rng = None
        if use_pallas:
            from calitas_tpu.ops.dp_pallas2 import (
                _pallas_screen_dual,
                pack_tcols_jax,
            )

            if pam_spec is not None and not pam_staged:
                end_ok, start_ok = _pam_bit_planes(wins, pam_spec)
                packed = wins | (end_ok << 4) | (start_ok << 5)
            else:
                # pam_staged: the gate bits ride in the annotated genome
                # (annotate_genome_pam), extracted with the windows.
                packed = wins
            if packed_tcols:
                tcols = pack_tcols_jax(packed)
                t_static = window
            else:
                tcols = (
                    packed.T.astype(jnp.int32).reshape(
                        window, batch_windows // LANES, LANES
                    )
                )
                t_static = None
            qv2 = jnp.concatenate([qv_fw, qv_rc], axis=0)
            res = _pallas_screen_dual(
                qv2, tcols, min_score, pam_gate=pam_spec is not None,
                emit_ranges=emit_ranges, T=t_static, interpret=interpret,
                **kw
            )
            if emit_ranges:
                both = res[0].reshape(2, batch_windows)
                rng = res[1].reshape(2, 2, batch_windows)
            else:
                both = res.reshape(2, batch_windows)
        else:
            from calitas_tpu.ops.dp_screen import (
                _screen_scores,
                _screen_scores_ranges,
            )

            skw = dict(match=match, mismatch=mismatch, qgap=qgap, tgap=tgap)
            if emit_ranges:
                best_fw, mn_fw, mx_fw = _screen_scores_ranges(
                    qv_fw[0].astype(jnp.uint8), wins, lens_flat, min_score,
                    **skw
                )
                best_rc, mn_rc, mx_rc = _screen_scores_ranges(
                    qv_rc[0].astype(jnp.uint8), wins, lens_flat, min_score,
                    **skw
                )
                rng = jnp.stack(
                    [jnp.stack([mn_fw, mx_fw]), jnp.stack([mn_rc, mx_rc])]
                )
            else:
                best_fw = _screen_scores(
                    qv_fw[0].astype(jnp.uint8), wins, lens_flat, **skw
                )
                best_rc = _screen_scores(
                    qv_rc[0].astype(jnp.uint8), wins, lens_flat, **skw
                )
            both = jnp.stack([best_fw, best_rc])
        # Threshold + bit-pack on device: the host only ever needs the
        # per-chain candidate flags, and the packed form is 32x smaller
        # than raw int32 maxima on the D2H path.
        packed = _pack_flag_bits(both >= min_score)
        out = jax.lax.dynamic_update_slice(
            out, packed, (0, b * (batch_windows // 8))
        )
        if emit_ranges:
            # Coarse block-granular uint8 ranges: 4 bytes per window on
            # the D2H path; the host widens each block edge back out, so
            # coarseness only costs < range_block(window) extra DP
            # columns per side.
            rb = range_block(window)
            mn, mx = rng[:, 0], rng[:, 1]
            mnb = jnp.clip((mn - 1) // rb, 0, 255).astype(jnp.uint8)
            mxb = jnp.clip((mx - 1) // rb, 0, 255).astype(jnp.uint8)
            pr = jnp.stack([mnb, mxb], axis=-1)  # [2, bw, 2]
            out_r = jax.lax.dynamic_update_slice(
                out_r, pr, (0, b * batch_windows, 0)
            )
        return out, out_r

    out0 = jnp.zeros((2, n_total // 8), jnp.uint8)
    out_r0 = jnp.zeros((2, n_total if emit_ranges else 1, 2), jnp.uint8)
    return jax.lax.fori_loop(0, n_batches, body, (out0, out_r0))


@partial(
    jax.jit,
    static_argnames=(
        "window", "step", "batch_windows", "max_batches",
        "Q", "match", "mismatch", "qgap", "tgap", "use_pallas", "pam_spec",
        "emit_ranges", "packed_tcols", "pam_staged", "interpret",
    ),
)
def _screen_genome(
    genome, qv_fw, qv_rc, n_batches, min_score, *,
    window, step, batch_windows, max_batches, Q, match, mismatch, qgap,
    tgap, use_pallas, pam_spec=None, emit_ranges=False, packed_tcols=True,
    pam_staged=False, interpret=False,
):
    return _screen_grid(
        genome, qv_fw, qv_rc, n_batches, min_score, jnp.int32(0),
        window=window, step=step, batch_windows=batch_windows,
        max_batches=max_batches, Q=Q, match=match, mismatch=mismatch,
        qgap=qgap, tgap=tgap, use_pallas=use_pallas, pam_spec=pam_spec,
        emit_ranges=emit_ranges, packed_tcols=packed_tcols,
        pam_staged=pam_staged, interpret=interpret,
    )


@partial(
    jax.jit,
    static_argnames=(
        "window", "step", "batch_windows", "max_batches",
        "Q", "match", "mismatch", "qgap", "tgap", "use_pallas", "pam_spec",
        "emit_ranges", "packed_tcols", "pam_staged", "interpret",
    ),
)
def _screen_genome_span(
    genome, qv_fw, qv_rc, n_batches, min_score, base0, *,
    window, step, batch_windows, max_batches, Q, match, mismatch, qgap,
    tgap, use_pallas, pam_spec=None, emit_ranges=False, packed_tcols=True,
    pam_staged=False, interpret=False,
):
    """A window-span slice of the contig screen (traced ``base0`` genome
    offset): the segmented screen dispatches several of these back to
    back so the host can finish segment N's candidates while the device
    screens segment N+1."""
    return _screen_grid(
        genome, qv_fw, qv_rc, n_batches, min_score, base0,
        window=window, step=step, batch_windows=batch_windows,
        max_batches=max_batches, Q=Q, match=match, mismatch=mismatch,
        qgap=qgap, tgap=tgap, use_pallas=use_pallas, pam_spec=pam_spec,
        emit_ranges=emit_ranges, packed_tcols=packed_tcols,
        pam_staged=pam_staged, interpret=interpret,
    )


class GenomeScreen:
    """Per-contig device screen: stage once, screen every window layout."""

    def __init__(
        self,
        scorer: Scorer,
        window: int = 1024,
        batch_windows: int = 8192,
        use_pallas: bool | None = None,
        interpret: bool = False,
        pack_staging: bool | None = None,
        packed_tcols: bool = True,
        pam_staged: bool = True,
    ):
        assert batch_windows % LANES == 0
        self.scorer = scorer
        self.window = window
        self.batch_windows = batch_windows
        if use_pallas is None:
            use_pallas = default_device_platform() == "tpu"
        self.use_pallas = use_pallas
        self.interpret = interpret
        #: None = decide from a one-time link-rate probe at first stage()
        self.pack_staging = pack_staging
        #: 4-bytes-per-int32 kernel tcols (4x less relayout traffic);
        #: False = legacy layout, kept as the in-process A/B baseline
        self.packed_tcols = packed_tcols
        #: PAM gate bits staged once per contig (annotate_genome_pam)
        #: instead of recomputed per window batch; False = per-batch
        #: planes, kept as the in-process A/B baseline
        self.pam_staged = pam_staged

    def _should_pack(self) -> bool:
        if self.pack_staging is None:
            self.pack_staging = _packing_pays()
        return self.pack_staging

    def _annotate(self, genome_dev, static_pam_spec):
        """Staged-gate form of the genome for this pam_spec.  Computed
        per screen call — one fused device pass over the contig, a few
        percent of the screen it precedes; deliberately NOT cached (an
        id-keyed cache would pin staged contigs in HBM past their
        lifetime)."""
        return self._annotate_fn(genome_dev, static_pam_spec)

    def _annotate_fn(self, genome_dev, static_pam_spec):
        return annotate_genome_pam(genome_dev, pam_spec=static_pam_spec)

    #: H2D staging chunk (large single transfers stall on tunneled links)
    STAGE_CHUNK = 64 * 1024 * 1024

    def stage(self, contig_bases: np.ndarray) -> jax.Array:
        """Upload a contig (raw bytes) as a zero-padded device mask array.

        Transport is link-adaptive: on fast links the raw bytes ship
        as-is and the 4-bit IUPAC encoding happens on device
        (:func:`_encode_staged` — the host does no per-base work); on
        slow links (tunneled dev TPUs at ~10-30 MB/s) the host encodes
        and nibble-packs two masks per byte, HALVING the H2D bytes, and
        the device unpacks (:func:`_unpack_staged`).  Both produce the
        identical mask array.  Chunked with progress logging so long
        transfers are observable."""
        import logging

        log = logging.getLogger("calitas_tpu.stage")
        padded_len = 1 << (len(contig_bases) + self.window - 1).bit_length()
        if self._should_pack():
            host = _pack_staging_nibbles(contig_bases, padded_len)
            decode = _unpack_staged
        else:
            host = np.zeros(padded_len, np.uint8)  # zero pad -> mask 0
            host[: len(contig_bases)] = contig_bases
            decode = _encode_staged
        n = len(host)
        if n <= self.STAGE_CHUNK:
            host_dev = jax.device_put(jnp.asarray(host))
        else:
            parts = []
            for off in range(0, n, self.STAGE_CHUNK):
                parts.append(
                    jax.device_put(jnp.asarray(host[off : off + self.STAGE_CHUNK]))
                )
                parts[-1].block_until_ready()
                log.info(
                    "staged %d/%d MB", min(off + self.STAGE_CHUNK, n) >> 20, n >> 20
                )
            host_dev = jnp.concatenate(parts)
        return decode(host_dev)

    def window_starts(self, contig_len: int, step: int) -> np.ndarray:
        """The reference's window starts: range(0, len-1, step)
        (SearchReference.scala:52)."""
        return np.arange(0, max(contig_len - 1, 0), step, dtype=np.int64)

    #: per-dispatch extraction footprint budget (window-bytes): wide
    #: windows shrink the batch instead of inflating the [bw, window]
    #: device intermediates (the default 8192 x 1024 layout is exactly
    #: at budget and stays unchanged; -w 16384 screens 512 windows per
    #: dispatch instead of OOMing the int32 transpose).
    BATCH_ELEM_BUDGET = 8 << 20

    def _batch_windows_for(self, n: int, unit: int) -> int:
        """Windows per device dispatch: the configured batch rounded up
        to the kernel unit, trimmed to the window count, and capped so
        batch * window stays within BATCH_ELEM_BUDGET.

        On the Pallas path the cap floors at BLOCK_W (one grid cell), so
        very wide windows exceed the budget by up to BLOCK_W * window
        HBM intermediates — verified on hardware to compile and run up
        to -w 16384 (Mosaic streams the column axis; per-cell VMEM does
        not hold the whole [window, 8, 128] block at once)."""
        cap = max(
            unit,
            (self.BATCH_ELEM_BUDGET // max(self.window, 1)) // unit * unit,
        )
        bw = min(-(-self.batch_windows // unit) * unit, -(-n // unit) * unit)
        return min(bw, cap)

    @staticmethod
    def _empty_result(return_chains: bool, return_ranges: bool):
        """Zero-window results shaped per the requested interface."""
        chains = np.zeros((2, 0), dtype=bool)
        if return_ranges:
            return chains, np.zeros((2, 0, 2), dtype=np.uint8)
        if return_chains:
            return chains
        return np.zeros(0, dtype=bool)

    def screen_contig(
        self,
        genome_dev: jax.Array,
        contig_len: int,
        step: int,
        dp_query: str,
        dp_query_rc: str,
        min_score: int,
        pam_spec=None,  # (dp-orientation pam strings, max_pam_mm, max_gap)
        return_chains: bool = False,
        return_ranges: bool = False,
    ) -> np.ndarray:
        """Returns the boolean hit flags for every reference window start.

        ``dp_query``/``dp_query_rc`` are the two DP queries (the guide in
        search orientation and its revcomp).  A True flag means some end
        column in [start, start+window) reaches ``min_score`` on either
        strand — a conservative superset of the reference's per-window
        hits (zero-padding and untrimmed Ns can only add candidates,
        which the exact host alignment then resolves).

        With ``return_ranges`` (implies per-chain flags) also returns a
        [2, n, 2] uint8 array of coarse per-chain qualifying end-column
        ranges: entry (c, i) = (min_block, max_block) in blocks of
        ``rb = range_block(self.window)`` columns (8 up to 2048-column
        windows, doubling beyond), i.e. qualifying 1-based end columns
        of window i on chain c all lie within
        [min_block*rb + 1, (max_block+1)*rb].  Only meaningful where the
        chain flag is set.
        """
        starts = self.window_starts(contig_len, step)
        n = len(starts)
        if n == 0:
            return self._empty_result(return_chains, return_ranges)
        Q = len(dp_query)
        # Long guides exceed the pallas unroll budget; the XLA screen
        # handles any Q.  Decide BEFORE the batch unit so long guides
        # batch at the XLA LANES granularity, not BLOCK_W.
        use_pallas = self.use_pallas and Q <= 48
        unit = BLOCK_W if use_pallas else LANES
        bw = self._batch_windows_for(n, unit)
        n_batches = -(-n // bw)
        # Bucket the static shapes (batch count and genome length) to
        # powers of two so multi-contig genomes reuse one compilation
        # instead of recompiling per contig.
        max_batches = 1 << (n_batches - 1).bit_length()
        need = (max_batches * bw - 1) * step + self.window + step
        static_pam_spec = _static_pam_spec(pam_spec, use_pallas)
        pam_staged = self.pam_staged and static_pam_spec is not None
        if pam_staged:
            genome_dev = self._annotate(genome_dev, static_pam_spec)
        genome_dev = _pad_genome(genome_dev, need)
        s = self.scorer
        qv_fw = jnp.asarray(encode_query(dp_query).astype(np.int32)[None, :])
        qv_rc = jnp.asarray(encode_query(dp_query_rc).astype(np.int32)[None, :])
        packed, packed_ranges = _screen_genome(
            genome_dev, qv_fw, qv_rc, jnp.int32(n_batches),
            jnp.int32(min_score),
            window=self.window, step=step, batch_windows=bw,
            max_batches=max_batches,
            Q=Q, match=s.match_score, mismatch=s.mismatch_score,
            qgap=s.query_gap_score, tgap=s.target_gap_score,
            use_pallas=use_pallas, pam_spec=static_pam_spec,
            emit_ranges=return_ranges, packed_tcols=self.packed_tcols,
            pam_staged=pam_staged, interpret=self.interpret,
        )
        chain_flags = _unpack_flag_bits(np.asarray(packed), n)  # [2, n]
        if return_ranges:
            ranges = np.asarray(packed_ranges)[:, :n]  # [2, n, 2] uint8
            return chain_flags, ranges
        if return_chains:
            return chain_flags
        return chain_flags.any(axis=0)

    #: segments per contig for the pipelined screen (screen_contig_async);
    #: each segment is its own device dispatch, so the host finishes
    #: segment N's candidates while the device screens segment N+1.
    #: Measured on the 1 Gb bench workload (interleaved in-process A/B):
    #: 16 segments ~0.44s vs 4 segments ~0.52s vs 2 segments ~0.60s —
    #: finer spans drain the finish pool sooner and shrink the tail where
    #: the host finishes the last span with an idle device; 32 showed no
    #: further gain.  Multi-guide (4x1Gb fused) confirmed 16 >= 4.
    SEGMENTS = 16
    #: below this many window batches segmentation can't amortize its
    #: extra dispatches — fall back to one span
    MIN_BATCHES_PER_SEGMENT = 4

    def screen_contig_async(
        self,
        genome_dev: jax.Array,
        contig_len: int,
        step: int,
        dp_query: str,
        dp_query_rc: str,
        min_score: int,
        pam_spec=None,
        segments: int | None = None,
    ) -> list:
        """The pipelined form of :meth:`screen_contig` (always per-chain
        flags + coarse ranges): dispatches the contig's window grid as
        several independent spans — ALL enqueued immediately, executed
        back to back by the device — and returns a list of
        ``(start_index, n_windows, resolve)`` triples in window order.
        ``resolve()`` blocks on that span's (tiny, bit-packed) readback
        and returns ``(chain_flags, ranges)`` for windows
        ``[start_index, start_index + n_windows)``.

        Flag/range values are bit-identical to one :meth:`screen_contig`
        call: the spans partition the same window grid, and each span
        runs the same device batch loop (``_screen_grid``) the
        single-span screen runs (pinned by tests/test_screen.py)."""
        starts = self.window_starts(contig_len, step)
        n = len(starts)
        if n == 0:
            return []
        Q = len(dp_query)
        use_pallas = self.use_pallas and Q <= 48  # unit follows the path
        unit = BLOCK_W if use_pallas else LANES
        bw = self._batch_windows_for(n, unit)
        n_batches = -(-n // bw)
        if segments is None:
            # Below a few batches per segment the extra dispatches can't
            # amortize; explicit requests skip this heuristic.
            segments = max(
                1,
                min(self.SEGMENTS, n_batches // self.MIN_BATCHES_PER_SEGMENT),
            )
        segments = max(1, min(segments, n_batches))
        bps = -(-n_batches // segments)  # batches per segment
        segments = -(-n_batches // bps)
        # One static shape for every segment (and every contig at this
        # batch-count bucket): one compilation.
        max_batches = 1 << (bps - 1).bit_length()
        last_base = (segments - 1) * bps * bw * step
        need = last_base + (max_batches * bw - 1) * step + self.window + step
        static_pam_spec = _static_pam_spec(pam_spec, use_pallas)
        pam_staged = self.pam_staged and static_pam_spec is not None
        if pam_staged:
            genome_dev = self._annotate(genome_dev, static_pam_spec)
        genome_dev = _pad_genome(genome_dev, need)
        s = self.scorer
        qv_fw = jnp.asarray(encode_query(dp_query).astype(np.int32)[None, :])
        qv_rc = jnp.asarray(encode_query(dp_query_rc).astype(np.int32)[None, :])
        out = []
        for seg in range(segments):
            b0 = seg * bps
            nb = min(bps, n_batches - b0)
            i0 = b0 * bw
            n_seg = min(n - i0, bps * bw)
            packed, packed_ranges = _screen_genome_span(
                genome_dev, qv_fw, qv_rc, jnp.int32(nb),
                jnp.int32(min_score), jnp.int32(b0 * bw * step),
                window=self.window, step=step, batch_windows=bw,
                max_batches=max_batches, Q=Q, match=s.match_score,
                mismatch=s.mismatch_score, qgap=s.query_gap_score,
                tgap=s.target_gap_score, use_pallas=use_pallas,
                pam_spec=static_pam_spec, emit_ranges=True,
                packed_tcols=self.packed_tcols, pam_staged=pam_staged,
                interpret=self.interpret,
            )

            # Start the (tiny) D2H copies as soon as each span's compute
            # finishes: resolve() then only waits, instead of paying one
            # serialized round trip per span (28 ms each on tunneled dev
            # links; harmless elsewhere).
            try:
                packed.copy_to_host_async()
                packed_ranges.copy_to_host_async()
            except Exception:
                pass

            def resolve(packed=packed, packed_ranges=packed_ranges,
                        n_seg=n_seg):
                chain_flags = _unpack_flag_bits(np.asarray(packed), n_seg)
                ranges = np.asarray(packed_ranges)[:, :n_seg]
                return chain_flags, ranges

            out.append((i0, n_seg, resolve))
        return out

    def screen_contig_multi_async(
        self,
        genome_dev: jax.Array,
        contig_len: int,
        step: int,
        dp_queries: list,  # [(dp_query, dp_query_rc), ...] all same length
        min_scores: list,  # [G] per-guide qualifying thresholds
        pam_spec=None,  # shared (dp-orientation pams, max_pam_mm, max_gap)
        segments: int | None = None,
    ) -> list:
        """The multi-guide form of :meth:`screen_contig_async` — FULL
        single-guide contract per guide (PAM gate, per-chain flags,
        coarse end-column ranges), with the window blocks extracted,
        transposed and PAM-annotated ONCE per batch for the whole guide
        group (the fused kernel revisits each resident block per guide
        instead of re-fetching it from HBM).

        Guides must share a length and (when given) a PAM spec — the
        gate bit planes live in the shared tcols.  Returns
        ``(start_index, n_windows, resolve)`` triples; ``resolve()`` ->
        ``(chain_flags [G, 2, n_seg] bool, ranges [G, 2, n_seg, 2]
        uint8)``.  Per guide, values are bit-identical to that guide's
        own :meth:`screen_contig_async` (pinned by tests/test_screen.py).
        """
        starts = self.window_starts(contig_len, step)
        n = len(starts)
        G = len(dp_queries)
        if n == 0 or G == 0:
            return []
        Q = len(dp_queries[0][0])
        use_pallas = self.use_pallas and Q <= 48
        unit = BLOCK_W if use_pallas else LANES
        bw = self._batch_windows_for(n, unit)
        n_batches = -(-n // bw)
        if segments is None:
            segments = max(
                1,
                min(self.SEGMENTS, n_batches // self.MIN_BATCHES_PER_SEGMENT),
            )
        segments = max(1, min(segments, n_batches))
        bps = -(-n_batches // segments)
        segments = -(-n_batches // bps)
        max_batches = 1 << (bps - 1).bit_length()
        last_base = (segments - 1) * bps * bw * step
        need = last_base + (max_batches * bw - 1) * step + self.window + step
        static_pam_spec = _static_pam_spec(pam_spec, use_pallas)
        pam_staged = self.pam_staged and static_pam_spec is not None
        if pam_staged:
            genome_dev = self._annotate(genome_dev, static_pam_spec)
        genome_dev = _pad_genome(genome_dev, need)
        s = self.scorer
        qvals = jnp.asarray(
            np.stack(
                [
                    np.stack([encode_query(q), encode_query(qrc)]).astype(
                        np.int32
                    )
                    for q, qrc in dp_queries
                ]
            )
        )
        ms = jnp.asarray(np.asarray(min_scores, dtype=np.int32))
        out = []
        for seg in range(segments):
            b0 = seg * bps
            nb = min(bps, n_batches - b0)
            i0 = b0 * bw
            n_seg = min(n - i0, bps * bw)
            packed, packed_ranges = _screen_genome_multi_span(
                genome_dev, qvals, jnp.int32(nb), ms,
                jnp.int32(b0 * bw * step),
                window=self.window, step=step, batch_windows=bw,
                max_batches=max_batches, Q=Q, G=G, match=s.match_score,
                mismatch=s.mismatch_score, qgap=s.query_gap_score,
                tgap=s.target_gap_score, use_pallas=use_pallas,
                pam_spec=static_pam_spec, emit_ranges=True,
                packed_tcols=self.packed_tcols, pam_staged=pam_staged,
                interpret=self.interpret,
            )
            try:
                packed.copy_to_host_async()
                packed_ranges.copy_to_host_async()
            except Exception:
                pass

            def resolve(packed=packed, packed_ranges=packed_ranges,
                        n_seg=n_seg):
                chain_flags = _unpack_flag_bits(np.asarray(packed), n_seg)
                ranges = np.asarray(packed_ranges)[:, :, :n_seg]
                return chain_flags, ranges

            out.append((i0, n_seg, resolve))
        return out


# ---------------------------------------------------------------------------
# Multi-device sharding
# ---------------------------------------------------------------------------

def make_sharded_grid_screen(
    mesh, *, window, step, batch_windows, batches_per_dev, Q,
    match, mismatch, qgap, tgap, use_pallas, pam_spec=None,
    emit_ranges=False, packed_tcols=True, pam_staged=False,
    interpret=False,
):
    """Jit a mesh-sharded :func:`_screen_grid`: each device owns a
    contiguous span of ``batches_per_dev`` window batches (its ``base0``)
    and runs the SAME device batch loop as the single-device screen —
    window extraction, dual-chain kernel, PAM gate, device thresholding,
    bit-packed flag (and coarse range) output.  The genome is replicated;
    the window axis is the data-parallel axis (SURVEY.md §2.10), so
    shards are independent and the gathered flags are bit-identical to
    single-device execution."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(genome, base0, n_batches, min_score, qv_fw, qv_rc):
        return _screen_grid(
            genome, qv_fw, qv_rc, n_batches[0], min_score, base0[0],
            window=window, step=step, batch_windows=batch_windows,
            max_batches=batches_per_dev, Q=Q, match=match,
            mismatch=mismatch, qgap=qgap, tgap=tgap, use_pallas=use_pallas,
            pam_spec=pam_spec, emit_ranges=emit_ranges,
            packed_tcols=packed_tcols, pam_staged=pam_staged,
            interpret=interpret,
        )

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(None, axis), P(None, axis, None)),
        check_vma=False,
    )
    return jax.jit(shard)


def make_sharded_grid_screen_multi(
    mesh, *, window, step, batch_windows, batches_per_dev, Q, G,
    match, mismatch, qgap, tgap, use_pallas, pam_spec=None,
    emit_ranges=False, packed_tcols=True, pam_staged=False,
    interpret=False,
):
    """Jit a mesh-sharded :func:`_screen_grid_multi`: the multi-guide
    analogue of :func:`make_sharded_grid_screen` — each device owns a
    contiguous batch span and runs the SAME fused guide-group loop as the
    single-device screen, so per-guide flags/ranges gathered across the
    mesh are bit-identical to single-device execution."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(genome, base0, n_batches, min_scores, qvals):
        return _screen_grid_multi(
            genome, qvals, n_batches[0], min_scores, base0[0],
            window=window, step=step, batch_windows=batch_windows,
            max_batches=batches_per_dev, Q=Q, G=G, match=match,
            mismatch=mismatch, qgap=qgap, tgap=tgap, use_pallas=use_pallas,
            pam_spec=pam_spec, emit_ranges=emit_ranges,
            packed_tcols=packed_tcols, pam_staged=pam_staged,
            interpret=interpret,
        )

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P()),
        out_specs=(P(None, None, axis), P(None, None, axis, None)),
        check_vma=False,
    )
    return jax.jit(shard)


class ShardedGenomeScreen(GenomeScreen):
    """GenomeScreen over a device mesh: the window-batch grid is split
    into contiguous per-device spans; the genome is replicated.  Same
    interface and bit-identical output as :class:`GenomeScreen`
    (PAM gate, per-chain flags, packed D2H, end-column ranges included —
    enforced by tests/test_sharding.py)."""

    def __init__(self, scorer: Scorer, mesh, window: int = 1024,
                 batch_windows: int = 8192, use_pallas: bool | None = None,
                 interpret: bool = False, pack_staging: bool | None = None):
        super().__init__(scorer, window=window, batch_windows=batch_windows,
                         use_pallas=use_pallas, interpret=interpret,
                         pack_staging=pack_staging)
        self.mesh = mesh
        self._fn_cache = {}
        self._replicated = None

    def _sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self._replicated is None:
            self._replicated = NamedSharding(self.mesh, P())
        return self._replicated

    def stage(self, contig_bases: np.ndarray):
        """Upload the contig replicated to every mesh device, with the
        same link-adaptive transport as the single-device path (raw
        bytes + on-device encode, or nibble-packed + on-device unpack)."""
        padded_len = 1 << (len(contig_bases) + self.window - 1).bit_length()
        if self._should_pack():
            host = _pack_staging_nibbles(contig_bases, padded_len)
            decode = _unpack_staged
        else:
            host = np.zeros(padded_len, np.uint8)  # zero pad -> mask 0
            host[: len(contig_bases)] = contig_bases
            decode = _encode_staged
        host_dev = jax.device_put(jnp.asarray(host), self._sharding())
        out = decode(host_dev)
        assert out.sharding.is_fully_replicated
        return out

    def _annotate_fn(self, genome_dev, static_pam_spec):
        # Pin the annotation replicated on the mesh (elementwise on a
        # replicated input would stay replicated anyway; the explicit
        # out_sharding makes it structural).
        key = ("anno_fn", static_pam_spec)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = jax.jit(
                partial(annotate_genome_pam, pam_spec=static_pam_spec),
                out_shardings=self._sharding(),
            )
            self._fn_cache[key] = fn
        return fn(genome_dev)

    def _pad_replicated(self, genome_dev, need: int):
        extra = need - genome_dev.shape[0]
        fn = self._fn_cache.get("pad")
        if fn is None:
            # The zero tail is built eagerly and passed as an argument:
            # a jnp.zeros literal inside the jitted program would be
            # constant-folded into a multi-MB constant whose compile
            # takes minutes over a remote link.
            fn = jax.jit(
                lambda g, z: jnp.concatenate([g, z]),
                out_shardings=self._sharding(),
            )
            self._fn_cache["pad"] = fn
        zeros = jax.device_put(
            jnp.zeros(extra, jnp.uint8), self._sharding()
        )
        return fn(genome_dev, zeros)

    def screen_contig(
        self,
        genome_dev,
        contig_len,
        step,
        dp_query,
        dp_query_rc,
        min_score,
        pam_spec=None,
        return_chains: bool = False,
        return_ranges: bool = False,
    ):
        starts = self.window_starts(contig_len, step)
        n = len(starts)
        if n == 0:
            return self._empty_result(return_chains, return_ranges)
        n_dev = self.mesh.devices.size
        s = self.scorer
        Q = len(dp_query)
        use_pallas = self.use_pallas and Q <= 48
        unit = BLOCK_W if use_pallas else LANES
        bw = self._batch_windows_for(n, unit)
        batches_total = -(-n // bw)
        # Power-of-two bucketing of the per-device span so multi-contig
        # genomes reuse one compilation (same trick as single-device).
        batches_per_dev = 1 << (-(-batches_total // n_dev) - 1).bit_length()
        total = n_dev * batches_per_dev * bw
        need = (total - 1) * step + self.window + step
        static_pam_spec = _static_pam_spec(pam_spec, use_pallas)
        pam_staged = self.pam_staged and static_pam_spec is not None
        if pam_staged:
            genome_dev = self._annotate(genome_dev, static_pam_spec)
        if need > genome_dev.shape[0]:
            need = 1 << (need - 1).bit_length()
            genome_dev = self._pad_replicated(genome_dev, need)
        key = (
            Q, step, bw, batches_per_dev, static_pam_spec, return_ranges,
            use_pallas, self.packed_tcols, pam_staged,
        )
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = make_sharded_grid_screen(
                self.mesh, window=self.window, step=step, batch_windows=bw,
                batches_per_dev=batches_per_dev, Q=Q,
                match=s.match_score, mismatch=s.mismatch_score,
                qgap=s.query_gap_score, tgap=s.target_gap_score,
                use_pallas=use_pallas, pam_spec=static_pam_spec,
                emit_ranges=return_ranges, packed_tcols=self.packed_tcols,
                pam_staged=pam_staged, interpret=self.interpret,
            )
            self._fn_cache[key] = fn
        # Per-shard span origins and live batch counts: tail shards run
        # only their populated batches (skipped batches leave zero flags).
        base0 = (
            np.arange(n_dev, dtype=np.int32) * (batches_per_dev * bw * step)
        )
        live = np.clip(
            batches_total - np.arange(n_dev) * batches_per_dev,
            0, batches_per_dev,
        ).astype(np.int32)
        qv_fw = jnp.asarray(encode_query(dp_query).astype(np.int32)[None, :])
        qv_rc = jnp.asarray(encode_query(dp_query_rc).astype(np.int32)[None, :])
        packed, packed_ranges = fn(
            genome_dev, jnp.asarray(base0), jnp.asarray(live),
            jnp.int32(min_score), qv_fw, qv_rc,
        )
        chain_flags = _unpack_flag_bits(np.asarray(packed), n)  # [2, n]
        if return_ranges:
            ranges = np.asarray(packed_ranges)[:, :n]  # [2, n, 2] uint8
            return chain_flags, ranges
        if return_chains:
            return chain_flags
        return chain_flags.any(axis=0)

    def screen_contig_async(
        self,
        genome_dev,
        contig_len: int,
        step: int,
        dp_query: str,
        dp_query_rc: str,
        min_score: int,
        pam_spec=None,
        segments: int | None = None,
    ) -> list:
        """The pipelined form of the sharded :meth:`screen_contig` (same
        interface and semantics as :meth:`GenomeScreen.screen_contig_async`):
        the contig's window grid splits into mesh-wide segments — each
        segment shards its batches across the devices exactly like the
        one-shot screen — and ALL segments are enqueued before any
        readback, so the host finishes segment N's candidates while the
        mesh screens segment N+1.  Flag/range values per window are
        bit-identical to one :meth:`screen_contig` call."""
        starts = self.window_starts(contig_len, step)
        n = len(starts)
        if n == 0:
            return []
        n_dev = self.mesh.devices.size
        s = self.scorer
        Q = len(dp_query)
        use_pallas = self.use_pallas and Q <= 48
        unit = BLOCK_W if use_pallas else LANES
        bw = self._batch_windows_for(n, unit)
        batches_total = -(-n // bw)
        if segments is None:
            segments = max(
                1,
                min(
                    self.SEGMENTS,
                    batches_total // (self.MIN_BATCHES_PER_SEGMENT * n_dev),
                ),
            )
        segments = max(1, min(segments, batches_total))
        # One compiled per-device span serves every segment: each segment
        # covers exactly n_dev * batches_per_dev batches (live-clipped at
        # the tail), so per-device spans stay globally contiguous and the
        # packed flags concatenate in window order like the one-shot path.
        batches_per_dev = 1 << (
            -(-batches_total // (segments * n_dev)) - 1
        ).bit_length()
        seg_batches = n_dev * batches_per_dev
        segments = -(-batches_total // seg_batches)
        need = (batches_total * bw + bw - 1) * step + self.window + step
        static_pam_spec = _static_pam_spec(pam_spec, use_pallas)
        pam_staged = self.pam_staged and static_pam_spec is not None
        if pam_staged:
            genome_dev = self._annotate(genome_dev, static_pam_spec)
        if need > genome_dev.shape[0]:
            need = 1 << (need - 1).bit_length()
            genome_dev = self._pad_replicated(genome_dev, need)
        key = (
            Q, step, bw, batches_per_dev, static_pam_spec, True, use_pallas,
            self.packed_tcols, pam_staged,
        )
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = make_sharded_grid_screen(
                self.mesh, window=self.window, step=step, batch_windows=bw,
                batches_per_dev=batches_per_dev, Q=Q,
                match=s.match_score, mismatch=s.mismatch_score,
                qgap=s.query_gap_score, tgap=s.target_gap_score,
                use_pallas=use_pallas, pam_spec=static_pam_spec,
                emit_ranges=True, packed_tcols=self.packed_tcols,
                pam_staged=pam_staged, interpret=self.interpret,
            )
            self._fn_cache[key] = fn
        qv_fw = jnp.asarray(encode_query(dp_query).astype(np.int32)[None, :])
        qv_rc = jnp.asarray(encode_query(dp_query_rc).astype(np.int32)[None, :])
        out = []
        for seg in range(segments):
            b0 = seg * seg_batches
            base0 = (
                (b0 + np.arange(n_dev) * batches_per_dev) * (bw * step)
            ).astype(np.int32)
            live = np.clip(
                batches_total - b0 - np.arange(n_dev) * batches_per_dev,
                0, batches_per_dev,
            ).astype(np.int32)
            packed, packed_ranges = fn(
                genome_dev, jnp.asarray(base0), jnp.asarray(live),
                jnp.int32(min_score), qv_fw, qv_rc,
            )
            try:
                packed.copy_to_host_async()
                packed_ranges.copy_to_host_async()
            except Exception:
                pass
            i0 = b0 * bw
            n_seg = min(n - i0, seg_batches * bw)

            def resolve(packed=packed, packed_ranges=packed_ranges,
                        n_seg=n_seg):
                chain_flags = _unpack_flag_bits(np.asarray(packed), n_seg)
                ranges = np.asarray(packed_ranges)[:, :n_seg]
                return chain_flags, ranges

            out.append((i0, n_seg, resolve))
        return out

    def screen_contig_multi_async(
        self,
        genome_dev,
        contig_len: int,
        step: int,
        dp_queries: list,
        min_scores: list,
        pam_spec=None,
        segments: int | None = None,
    ) -> list:
        """Mesh-sharded multi-guide segmented screen: same interface and
        per-guide bit-identical semantics as the single-device
        :meth:`GenomeScreen.screen_contig_multi_async`, with each
        segment's batches sharded across the mesh exactly like
        :meth:`screen_contig_async` (pinned by tests/test_sharding.py)."""
        starts = self.window_starts(contig_len, step)
        n = len(starts)
        G = len(dp_queries)
        if n == 0 or G == 0:
            return []
        n_dev = self.mesh.devices.size
        s = self.scorer
        Q = len(dp_queries[0][0])
        use_pallas = self.use_pallas and Q <= 48
        unit = BLOCK_W if use_pallas else LANES
        bw = self._batch_windows_for(n, unit)
        batches_total = -(-n // bw)
        if segments is None:
            segments = max(
                1,
                min(
                    self.SEGMENTS,
                    batches_total // (self.MIN_BATCHES_PER_SEGMENT * n_dev),
                ),
            )
        segments = max(1, min(segments, batches_total))
        batches_per_dev = 1 << (
            -(-batches_total // (segments * n_dev)) - 1
        ).bit_length()
        seg_batches = n_dev * batches_per_dev
        segments = -(-batches_total // seg_batches)
        need = (batches_total * bw + bw - 1) * step + self.window + step
        static_pam_spec = _static_pam_spec(pam_spec, use_pallas)
        pam_staged = self.pam_staged and static_pam_spec is not None
        if pam_staged:
            genome_dev = self._annotate(genome_dev, static_pam_spec)
        if need > genome_dev.shape[0]:
            need = 1 << (need - 1).bit_length()
            genome_dev = self._pad_replicated(genome_dev, need)
        key = (
            "multi", Q, G, step, bw, batches_per_dev, static_pam_spec,
            use_pallas, self.packed_tcols, pam_staged,
        )
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = make_sharded_grid_screen_multi(
                self.mesh, window=self.window, step=step, batch_windows=bw,
                batches_per_dev=batches_per_dev, Q=Q, G=G,
                match=s.match_score, mismatch=s.mismatch_score,
                qgap=s.query_gap_score, tgap=s.target_gap_score,
                use_pallas=use_pallas, pam_spec=static_pam_spec,
                emit_ranges=True, packed_tcols=self.packed_tcols,
                pam_staged=pam_staged, interpret=self.interpret,
            )
            self._fn_cache[key] = fn
        qvals = jnp.asarray(
            np.stack(
                [
                    np.stack([encode_query(q), encode_query(qrc)]).astype(
                        np.int32
                    )
                    for q, qrc in dp_queries
                ]
            )
        )
        ms = jnp.asarray(np.asarray(min_scores, dtype=np.int32))
        out = []
        for seg in range(segments):
            b0 = seg * seg_batches
            base0 = (
                (b0 + np.arange(n_dev) * batches_per_dev) * (bw * step)
            ).astype(np.int32)
            live = np.clip(
                batches_total - b0 - np.arange(n_dev) * batches_per_dev,
                0, batches_per_dev,
            ).astype(np.int32)
            packed, packed_ranges = fn(
                genome_dev, jnp.asarray(base0), jnp.asarray(live), ms, qvals,
            )
            try:
                packed.copy_to_host_async()
                packed_ranges.copy_to_host_async()
            except Exception:
                pass
            i0 = b0 * bw
            n_seg = min(n - i0, seg_batches * bw)

            def resolve(packed=packed, packed_ranges=packed_ranges,
                        n_seg=n_seg):
                chain_flags = _unpack_flag_bits(np.asarray(packed), n_seg)
                ranges = np.asarray(packed_ranges)[:, :, :n_seg]
                return chain_flags, ranges

            out.append((i0, n_seg, resolve))
        return out


# ---------------------------------------------------------------------------
# Multi-guide screening (same-length guide groups share window extraction
# AND per-block HBM traffic; full single-guide contract per guide: PAM
# gate via the shared tcols bit planes + per-guide end-column ranges)
# ---------------------------------------------------------------------------

def _screen_grid_multi(
    genome,
    qvals,  # [G, 2, Q] int32
    n_batches,  # traced scalar
    min_scores,  # [G] int32: per-guide candidate thresholds
    base0,  # traced int32 genome offset of the first window
    *,
    window: int,
    step: int,
    batch_windows: int,
    max_batches: int,
    Q: int,
    G: int,
    match: int,
    mismatch: int,
    qgap: int,
    tgap: int,
    use_pallas: bool,
    pam_spec=None,
    emit_ranges: bool = False,
    packed_tcols: bool = True,
    pam_staged: bool = False,
    interpret: bool = False,
):
    """The multi-guide analogue of :func:`_screen_grid`: one window
    extraction + PAM-plane pass per batch serves every guide in the
    group.  Returns ([G, 2, total//8] uint8 flags, [G, 2, total, 2]
    uint8 coarse ranges — [G, 2, 1, 2] placeholder when ranges off)."""
    lens_flat = jnp.full((batch_windows,), window, jnp.int32)
    n_total = max_batches * batch_windows

    def body(b, outs):
        out, out_r = outs
        wins = extract_window_grid(
            genome, base0 + b * batch_windows * step, batch_windows, step,
            window,
        )
        rng = None
        if use_pallas:
            from calitas_tpu.ops.dp_pallas2 import (
                _pallas_screen_multi,
                pack_tcols_jax,
            )

            if pam_spec is not None and not pam_staged:
                end_ok, start_ok = _pam_bit_planes(wins, pam_spec)
                packed_w = wins | (end_ok << 4) | (start_ok << 5)
            else:
                # pam_staged: gate bits ride in the annotated genome
                packed_w = wins
            if packed_tcols:
                tcols = pack_tcols_jax(packed_w)
                t_static = window
            else:
                tcols = packed_w.T.astype(jnp.int32).reshape(
                    window, batch_windows // LANES, LANES
                )
                t_static = None
            res = _pallas_screen_multi(
                qvals, tcols, min_scores,
                Q=Q, match=match, mismatch=mismatch, qgap=qgap, tgap=tgap,
                pam_gate=pam_spec is not None, emit_ranges=emit_ranges,
                T=t_static, interpret=interpret,
            )
            if emit_ranges:
                best = res[0].reshape(G, 2, batch_windows)
                rng = res[1].reshape(G, 2, 2, batch_windows)
            else:
                best = res.reshape(G, 2, batch_windows)
        else:
            from calitas_tpu.ops.dp_screen import (
                _screen_scores,
                _screen_scores_ranges,
            )

            skw = dict(match=match, mismatch=mismatch, qgap=qgap, tgap=tgap)
            per_guide = []
            per_rng = []
            for g in range(G):
                if emit_ranges:
                    bf, mn_f, mx_f = _screen_scores_ranges(
                        qvals[g, 0].astype(jnp.uint8), wins, lens_flat,
                        min_scores[g], **skw
                    )
                    br, mn_r, mx_r = _screen_scores_ranges(
                        qvals[g, 1].astype(jnp.uint8), wins, lens_flat,
                        min_scores[g], **skw
                    )
                    per_rng.append(
                        jnp.stack(
                            [jnp.stack([mn_f, mx_f]), jnp.stack([mn_r, mx_r])]
                        )
                    )
                else:
                    bf = _screen_scores(
                        qvals[g, 0].astype(jnp.uint8), wins, lens_flat, **skw
                    )
                    br = _screen_scores(
                        qvals[g, 1].astype(jnp.uint8), wins, lens_flat, **skw
                    )
                per_guide.append(jnp.stack([bf, br]))
            best = jnp.stack(per_guide)  # [G, 2, bw]
            if emit_ranges:
                rng = jnp.stack(per_rng)  # [G, 2, 2, bw]
        packed = _pack_flag_bits(best >= min_scores[:, None, None])
        out = jax.lax.dynamic_update_slice(
            out, packed, (0, 0, b * (batch_windows // 8))
        )
        if emit_ranges:
            rb = range_block(window)
            mn, mx = rng[:, :, 0], rng[:, :, 1]
            mnb = jnp.clip((mn - 1) // rb, 0, 255).astype(jnp.uint8)
            mxb = jnp.clip((mx - 1) // rb, 0, 255).astype(jnp.uint8)
            pr = jnp.stack([mnb, mxb], axis=-1)  # [G, 2, bw, 2]
            out_r = jax.lax.dynamic_update_slice(
                out_r, pr, (0, 0, b * batch_windows, 0)
            )
        return out, out_r

    out0 = jnp.zeros((G, 2, n_total // 8), jnp.uint8)
    out_r0 = jnp.zeros((G, 2, n_total if emit_ranges else 1, 2), jnp.uint8)
    return jax.lax.fori_loop(0, n_batches, body, (out0, out_r0))


@partial(
    jax.jit,
    static_argnames=(
        "window", "step", "batch_windows", "max_batches",
        "Q", "G", "match", "mismatch", "qgap", "tgap", "use_pallas",
        "pam_spec", "emit_ranges", "packed_tcols", "pam_staged",
        "interpret",
    ),
)
def _screen_genome_multi(
    genome, qvals, n_batches, min_scores, *,
    window, step, batch_windows, max_batches, Q, G, match, mismatch, qgap,
    tgap, use_pallas, pam_spec=None, emit_ranges=False, packed_tcols=True,
    pam_staged=False, interpret=False,
):
    return _screen_grid_multi(
        genome, qvals, n_batches, min_scores, jnp.int32(0),
        window=window, step=step, batch_windows=batch_windows,
        max_batches=max_batches, Q=Q, G=G, match=match, mismatch=mismatch,
        qgap=qgap, tgap=tgap, use_pallas=use_pallas, pam_spec=pam_spec,
        emit_ranges=emit_ranges, packed_tcols=packed_tcols,
        pam_staged=pam_staged, interpret=interpret,
    )


@partial(
    jax.jit,
    static_argnames=(
        "window", "step", "batch_windows", "max_batches",
        "Q", "G", "match", "mismatch", "qgap", "tgap", "use_pallas",
        "pam_spec", "emit_ranges", "packed_tcols", "pam_staged",
        "interpret",
    ),
)
def _screen_genome_multi_span(
    genome, qvals, n_batches, min_scores, base0, *,
    window, step, batch_windows, max_batches, Q, G, match, mismatch, qgap,
    tgap, use_pallas, pam_spec=None, emit_ranges=False, packed_tcols=True,
    pam_staged=False, interpret=False,
):
    """A window-span slice of the multi-guide contig screen (traced
    ``base0``), the segmented-dispatch unit of
    :meth:`GenomeScreen.screen_contig_multi_async`."""
    return _screen_grid_multi(
        genome, qvals, n_batches, min_scores, base0,
        window=window, step=step, batch_windows=batch_windows,
        max_batches=max_batches, Q=Q, G=G, match=match, mismatch=mismatch,
        qgap=qgap, tgap=tgap, use_pallas=use_pallas, pam_spec=pam_spec,
        emit_ranges=emit_ranges, packed_tcols=packed_tcols,
        pam_staged=pam_staged, interpret=interpret,
    )


@partial(
    jax.jit,
    static_argnames=(
        "Q", "G", "match", "mismatch", "qgap", "tgap", "use_pallas",
        "packed_tcols", "interpret",
    ),
)
def _slot_flags_multi(
    qvals,  # [G, 2, Q] int32: fw and rc query masks per guide
    tmasks,  # [B, T] uint8 slot batch (zero-padded rows/columns)
    lengths,  # [B] int32 valid slot lengths
    min_scores,  # [G] int32 per-guide candidate thresholds
    *,
    Q: int,
    G: int,
    match: int,
    mismatch: int,
    qgap: int,
    tgap: int,
    use_pallas: bool,
    packed_tcols: bool = True,
    interpret: bool = False,
):
    """Candidate flags for G same-length guides over one slot batch in a
    SINGLE dispatch: per-guide dual-chain screen, device thresholding,
    bit-packed [G, B//8] uint8 output.  The Pallas path reuses the
    multi-guide window kernel (slots fetched from HBM once per block for
    all guides) and ignores ``lengths`` — zero padding only adds
    candidate end columns, so its flags are a conservative superset,
    which the exact host alignment then resolves."""
    B, T = tmasks.shape
    if use_pallas:
        from calitas_tpu.ops.dp_pallas2 import (
            _pallas_screen_multi,
            pack_tcols_jax,
        )

        if packed_tcols:
            tcols = pack_tcols_jax(tmasks)
            t_static = T
        else:
            tcols = tmasks.T.astype(jnp.int32).reshape(T, B // LANES, LANES)
            t_static = None
        best = _pallas_screen_multi(
            qvals, tcols, Q=Q, match=match, mismatch=mismatch, qgap=qgap,
            tgap=tgap, T=t_static, interpret=interpret,
        ).reshape(G, 2, B)
    else:
        from calitas_tpu.ops.dp_screen import _screen_scores

        skw = dict(match=match, mismatch=mismatch, qgap=qgap, tgap=tgap)
        best = jnp.stack(
            [
                jnp.stack(
                    [
                        _screen_scores(
                            qvals[g, 0].astype(jnp.uint8), tmasks, lengths,
                            **skw
                        ),
                        _screen_scores(
                            qvals[g, 1].astype(jnp.uint8), tmasks, lengths,
                            **skw
                        ),
                    ]
                )
                for g in range(G)
            ]
        )  # [G, 2, B]
    flags = (best >= min_scores[:, None, None]).any(axis=1)  # [G, B]
    return _pack_flag_bits(flags)


@jax.jit
def _unpack_slot_nibbles(packed):
    """[B, T/2] uint8 nibble pairs -> [B, T] uint8 4-bit masks on device
    (column 2i = low nibble of byte i, 2i+1 = high nibble)."""
    B = packed.shape[0]
    return jnp.stack(
        [packed & jnp.uint8(15), packed >> 4], axis=-1
    ).reshape(B, -1)


#: (mesh, Q, G, scores..., use_pallas, packed_tcols, interpret) -> jitted
#: shard_map'd slot screen (jax.sharding.Mesh is hashable)
_SHARDED_SLOT_FN_CACHE: dict = {}


def make_sharded_slot_flags(
    mesh, *, Q, G, match, mismatch, qgap, tgap, use_pallas,
    packed_tcols=True, interpret=False,
):
    """Jit a mesh-sharded :func:`_slot_flags_multi`: the slot-batch axis
    is data-parallel across the mesh (each device screens its own span
    of rows for every guide in the group, exactly like the single-device
    dispatch), queries replicated, bit-packed per-shard flags gathered
    in row order — so the unpacked flags are bit-identical to
    single-device execution.  This is the variant pass's multi-device
    screen: variant windows are explicit [B, slot] batches, so the
    batch axis plays the role the window grid plays in
    :func:`make_sharded_grid_screen` (SURVEY.md §2.10; variant windows
    share the reference pass's pool in SearchReference.scala:582)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(qvals, tmasks, lengths, min_scores):
        return _slot_flags_multi(
            qvals, tmasks, lengths, min_scores, Q=Q, G=G, match=match,
            mismatch=mismatch, qgap=qgap, tgap=tgap, use_pallas=use_pallas,
            packed_tcols=packed_tcols, interpret=interpret,
        )

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return jax.jit(shard)


def slot_batch_unit(any_pallas: bool, mesh=None) -> int:
    """Row granularity of one slot batch: whole Pallas blocks (or the
    bit-packer's 8) per device, times the mesh size when sharded."""
    from calitas_tpu.ops.dp_pallas2 import BLOCK_W

    unit = BLOCK_W if any_pallas else 8
    if mesh is not None:
        unit *= mesh.devices.size
    return unit


def screen_slots_multi(
    scorer: Scorer,
    tmasks: np.ndarray,  # [B, T] uint8, B a multiple of slot_batch_unit()
    lengths: np.ndarray,  # [B] valid slot lengths
    groups,  # [(use_pallas, qvals [G,2,Q] int32, min_scores [G]), ...]
    interpret: bool = False,
    mesh=None,
) -> list:
    """Screen one slot batch for several same-length guide groups: the
    batch uploads ONCE and each group costs one fused dispatch plus one
    bit-packed readback (the variant/pair passes' device cost is flat in
    guide count).  Returns one zero-arg resolver per group; resolving
    blocks on that group's (tiny) D2H and returns [G, B] bool flags.

    With a ``mesh`` the batch rows shard across the devices
    (:func:`make_sharded_slot_flags`) — B must then be a multiple of
    ``slot_batch_unit(any_pallas, mesh)``; flags are bit-identical to
    the single-device screen.

    Transport is link-adaptive like genome staging: on slow (tunneled)
    links the 4-bit masks ship nibble-packed — HALF the H2D bytes, the
    per-batch bottleneck of the variant pass — and unpack on device."""
    B, T = tmasks.shape
    sharding = None
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(mesh.axis_names[0]))

    def put(host_arr):
        arr = jnp.asarray(host_arr)
        return jax.device_put(arr, sharding) if sharding is not None else arr

    if T % 2 == 0 and _packing_pays():
        packed = tmasks[:, 0::2] | (tmasks[:, 1::2] << 4)
        tm = _unpack_slot_nibbles(put(packed))
    else:
        tm = put(tmasks)
    ln = put(lengths.astype(np.int32))
    outs = []
    for use_pallas, qvals, min_scores in groups:
        kw = dict(
            Q=int(qvals.shape[2]), G=int(qvals.shape[0]),
            match=scorer.match_score, mismatch=scorer.mismatch_score,
            qgap=scorer.query_gap_score, tgap=scorer.target_gap_score,
            use_pallas=use_pallas, interpret=interpret,
        )
        qv = jnp.asarray(qvals)
        ms = jnp.asarray(np.asarray(min_scores, np.int32))
        if sharding is not None:
            key = (mesh, *sorted(kw.items()))
            fn = _SHARDED_SLOT_FN_CACHE.get(key)
            if fn is None:
                fn = make_sharded_slot_flags(mesh, **kw)
                _SHARDED_SLOT_FN_CACHE[key] = fn
            out = fn(qv, tm, ln, ms)
        else:
            out = _slot_flags_multi(qv, tm, ln, ms, **kw)
        # Start the D2H copy as soon as the compute finishes so resolvers
        # wait instead of paying one serialized round trip each.
        try:
            out.copy_to_host_async()
        except Exception:
            pass
        outs.append(out)
    return [
        (lambda out=out: _unpack_flag_bits(np.asarray(out), B))
        for out in outs
    ]


def screen_contig_multi(
    screen: GenomeScreen,
    genome_dev,
    contig_len: int,
    step: int,
    dp_queries: list,  # [(dp_query, dp_query_rc), ...] all same length
    min_scores: list,
) -> np.ndarray:
    """Per-chain boolean hit flags [G, 2, n_windows] for a same-length
    guide group (chain 0 = DP query over the forward genome, 1 = its
    revcomp); the window blocks are extracted/transposed once and re-used
    across guides."""
    starts = screen.window_starts(contig_len, step)
    n = len(starts)
    G = len(dp_queries)
    if n == 0:
        return np.zeros((G, 2, 0), dtype=bool)
    Q = len(dp_queries[0][0])
    use_pallas = screen.use_pallas and Q <= 48
    unit = BLOCK_W if use_pallas else LANES
    bw = screen._batch_windows_for(n, unit)
    n_batches = -(-n // bw)
    max_batches = 1 << (n_batches - 1).bit_length()
    need = (max_batches * bw - 1) * step + screen.window + step
    genome_dev = _pad_genome(genome_dev, need)
    qvals = np.stack(
        [
            np.stack([encode_query(q), encode_query(qrc)]).astype(np.int32)
            for q, qrc in dp_queries
        ]
    )
    s = screen.scorer
    packed, _ = _screen_genome_multi(
        genome_dev, jnp.asarray(qvals), jnp.int32(n_batches),
        jnp.asarray(np.asarray(min_scores, dtype=np.int32)),
        window=screen.window, step=step, batch_windows=bw,
        max_batches=max_batches, Q=Q, G=G,
        match=s.match_score, mismatch=s.mismatch_score,
        qgap=s.query_gap_score, tgap=s.target_gap_score,
        use_pallas=use_pallas, packed_tcols=screen.packed_tcols,
        interpret=screen.interpret,
    )
    return _unpack_flag_bits(np.asarray(packed), n)
