from .engine import EngineStats, GenerationResult, ServingEngine
from .images import ImageResult, ImageServingEngine

__all__ = ["ServingEngine", "GenerationResult", "EngineStats",
           "ImageServingEngine", "ImageResult"]
