from fastvocoder_tpu.serving.batcher import DynamicBatcher
from fastvocoder_tpu.serving.model import ServingModel
from fastvocoder_tpu.serving.server import make_server, run_server

__all__ = ["DynamicBatcher", "ServingModel", "make_server", "run_server"]
