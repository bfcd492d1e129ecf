"""Model assemblies — the flagship end-to-end auralizer pipeline."""

from vaudio.models.auralizer_model import AuralizerModel

__all__ = ["AuralizerModel"]
