from fastvocoder_tpu.bin.evaluation import run_evaluation
from fastvocoder_tpu.bin.preprocess import run_preprocess
from fastvocoder_tpu.bin.publish import run_publisher
from fastvocoder_tpu.bin.serve import run_serve
from fastvocoder_tpu.bin.synthesize import run_synthesizer
from fastvocoder_tpu.bin.test import run_test
from fastvocoder_tpu.bin.train import run_train

__all__ = [
    "run_evaluation",
    "run_preprocess",
    "run_publisher",
    "run_serve",
    "run_synthesizer",
    "run_test",
    "run_train",
]
