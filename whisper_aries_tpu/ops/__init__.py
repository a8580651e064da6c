from whisper_aries_tpu.ops.quant import (
    dequantize_int8,
    quant_matmul,
    quantize_int8,
    quantize_model_params,
)

__all__ = [
    "dequantize_int8",
    "quant_matmul",
    "quantize_int8",
    "quantize_model_params",
]
