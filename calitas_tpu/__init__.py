"""calitas_tpu — a TPU-native CRISPR off-target search framework.

A from-scratch reimplementation of the capabilities of CALITAS
(editasmedicine/calitas): glocal alignment of guide+PAM sequences against
genomes with a net-cost scoring system, genome-wide candidate off-target
enumeration with canonical per-locus deduplication, VCF variant
integration, and the four CLI workflows (SearchReference, AlignToReference,
PairwiseAlignSequences, PrepareVcf).

Architecture (TPU-first, not a port):
  - core/    sequence encoding (IUPAC 4-bit masks), cigar, scoring, guide model
  - align/   exact alignment engine: DP oracle, PAM extension, dedup
  - ops/     batched JAX/Pallas DP kernels (the hot loop)
  - io/      FASTA (.fai/.dict), VCF, TSV-metric readers/writers
  - search/  genome windowing, variant haplotype engine, hit model
  - tools/   the four CLI tools
  - parallel/ device-mesh sharding of the search
"""

__version__ = "0.1.0"


def _enable_jax_compilation_cache() -> None:
    """Persist XLA compilations across CLI invocations (kernel compiles
    are tens of seconds; searches are often re-run with the same shapes)."""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "CALITAS_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "calitas_tpu", "jax"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
