from fastvocoder_tpu.runtime.prefetch import prefetch_to_device
from fastvocoder_tpu.runtime.profiler import StepTimer, annotate, trace

__all__ = ["StepTimer", "annotate", "trace", "prefetch_to_device"]
