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
