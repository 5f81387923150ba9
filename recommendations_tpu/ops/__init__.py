from recommendations_tpu.ops.fused_attention import (
    fused_flash_attention,
    fused_flash_attention_bias,
)
