from msnv_tpu.ops.quantize import (
    ulaw, iulaw, midrise, imidrise, uquantize, udequantize,
    linear_quantize, linear_dequantize, q_zero,
)
from msnv_tpu.ops.interpolate import interpolation
