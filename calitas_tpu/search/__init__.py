from calitas_tpu.search.hits import ReferenceHit, HitBuilder, sort_hits, remove_overlaps

__all__ = ["ReferenceHit", "HitBuilder", "sort_hits", "remove_overlaps"]
