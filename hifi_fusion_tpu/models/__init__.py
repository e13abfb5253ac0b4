from .pipeline import FusionPipeline
