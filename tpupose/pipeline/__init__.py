"""Pipeline facade + registries."""
from tpupose.pipeline.facade import Pipeline

__all__ = ["Pipeline"]
