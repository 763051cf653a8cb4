"""Inference engine: sampling, KV-cache generation, quantization, batching.

Parity: reference ``InferenceEngine`` (Engine/InferenceEngine.ixx —
aspirational there, real here) extended per BASELINE to the quantized
continuous-batching engine.
"""

from mila_tpu.inference.generator import Generator
from mila_tpu.inference.speculative import SpeculativeGenerator
from mila_tpu.inference.sampling import SamplingConfig, sample_logits, sample_mult

__all__ = ["Generator", "SamplingConfig", "SpeculativeGenerator", "sample_logits", "sample_mult"]
