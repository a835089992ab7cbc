"""Custom TPU kernels (Pallas) + sharded ops XLA doesn't schedule well."""

from sincformer_tpu.ops.attention import (dot_product_attention,  # noqa: F401
                                          ring_mesh)
from sincformer_tpu.ops.conv_gn_pallas import conv1d_gn  # noqa: F401
from sincformer_tpu.ops.fused_ffn import fused_ffn  # noqa: F401
from sincformer_tpu.ops.meddis_pallas import meddis_pallas  # noqa: F401
from sincformer_tpu.ops.quantize import (dequantize_int8,  # noqa: F401
                                         dequantize_tree, quantize_int8,
                                         quantize_tree)
from sincformer_tpu.ops.ring_attention import (ring_attention,  # noqa: F401
                                               ring_attention_in_mesh)
from sincformer_tpu.ops.speech_attention import speech_attention  # noqa: F401
