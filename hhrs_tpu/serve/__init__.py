from hhrs_tpu.serve.engine import RecommendationEngine

__all__ = ["RecommendationEngine"]
