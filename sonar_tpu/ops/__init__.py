from sonar_tpu.ops.attention import dispatch_sdpa, sdpa_xla, set_attention_impl  # noqa: F401
from sonar_tpu.ops.fbank import FbankConfig, batched_fbank, waveform_to_fbank  # noqa: F401
from sonar_tpu.ops.masks import additive_bias, causal_mask, length_mask  # noqa: F401
from sonar_tpu.ops.quantization import quantize_params_int8  # noqa: F401
