from .monitor import PipelineMonitor, Scenario   # noqa: F401
