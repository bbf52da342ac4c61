from audfprint_tpu.models.analyzer import Analyzer

__all__ = ["Analyzer"]
