from . import dedup, multimodal, similarity, text_quality

__all__ = ["dedup", "multimodal", "similarity", "text_quality"]
