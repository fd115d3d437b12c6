from .engine import EngineStats, GenerationResult, ServingEngine

__all__ = ["ServingEngine", "GenerationResult", "EngineStats"]
