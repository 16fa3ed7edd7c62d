from calitas_tpu.io.fasta import IndexedFasta, SequenceDictionary, ReferenceSetBuilder

__all__ = ["IndexedFasta", "SequenceDictionary", "ReferenceSetBuilder"]
