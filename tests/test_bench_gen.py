"""bench.py generates the benchmark genome twice — host-side (FASTA on
disk) and device-side (staged mask array) — from the same murmur3-fmix32
hash stream so no bulk transfer crosses the host<->device link.  These
tests pin that the two sides agree bit-for-bit with the production
staging encode (ops/genome_screen._encode_staged semantics)."""

import numpy as np

from bench import device_genome_masks, host_genome_codes
from calitas_tpu.core.sequence import TARGET_MASK_TABLE


def test_host_device_genome_parity_small():
    G = 5_000  # below the device chunk: single-block path
    padded = 1 << (G + 1023).bit_length()
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    host = letters[host_genome_codes(0, G)]
    dev = np.asarray(device_genome_masks(padded, G))
    assert dev.shape == (padded,)
    np.testing.assert_array_equal(dev[:G], TARGET_MASK_TABLE[host])
    assert not dev[G:].any()  # zero pad -> mask 0


def test_host_device_genome_parity_chunked():
    G = (1 << 22) + 12_345  # forces the fori_loop chunked path
    padded = 1 << (G + 1023).bit_length()
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    host = letters[host_genome_codes(0, G)]
    dev = np.asarray(device_genome_masks(padded, G))
    np.testing.assert_array_equal(dev[:G], TARGET_MASK_TABLE[host])
    assert not dev[G:].any()


def test_host_codes_chunking_invariant():
    # Chunked host generation (bench writes the FASTA in 64 MB chunks)
    # equals one-shot generation.
    a = host_genome_codes(0, 10_000)
    b = np.concatenate(
        [host_genome_codes(0, 4_096), host_genome_codes(4_096, 5_904)]
    )
    np.testing.assert_array_equal(a, b)
