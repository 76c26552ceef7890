"""Matmul precision policy is applied INSIDE the runtime-traced programs.

Reference parity rule (``sonar/inference_pipelines/text.py:36-54``): fp32
models compute true-fp32 matmuls; bf16 models run at the hardware default.
The policy must live in the runtime (``ops/precision.py``) — when it was a
pipeline-``predict``-only wrapper, ``warmup()`` compiled DEFAULT-precision
programs that predict (tracing under HIGHEST) never reused: the warmup
promise was silently broken for fp32 models and every direct-runtime call
ran a different program than the pipeline (double compiles suite-wide).

These tests only ``lower()`` (trace, no XLA compile) and inspect the
stablehlo text for the precision attribute.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.generation.beam_search import BeamSearchConfig
from sonar_tpu.generation.decoder_runtime import JitTextDecoder
from sonar_tpu.inference_pipelines.text import JitTextEncoder
from sonar_tpu.models.sonar_text import (
    SonarTextEncoder,
    sonar_text_decoder_archs,
    sonar_text_encoder_archs,
)
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder


@pytest.mark.parametrize("dtype,want_highest", [
    (jnp.float32, True),
    (jnp.bfloat16, False),
])
def test_runtime_programs_carry_dtype_precision(dtype, want_highest):
    cfg = sonar_text_decoder_archs.get("toy")
    dec = ConditionalTransformerDecoder(cfg, dtype=dtype)
    params = dec.init_params(jax.random.PRNGKey(0))
    rt = JitTextDecoder(dec, params)
    D = cfg.model_dim

    beam_fn = rt._build_beam_fn(BeamSearchConfig(beam_size=2, max_gen_len=2), 2)
    txt = beam_fn.lower(
        rt.params, jnp.zeros((2, 1, D), dtype), jnp.zeros((2, 2), jnp.int32),
        jnp.asarray(1.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
        jnp.asarray(1, jnp.int32), kernels_off=False,
    ).as_text()
    assert ("HIGHEST" in txt) == want_highest, "beam program precision"

    enc = SonarTextEncoder(sonar_text_encoder_archs.get("toy"), dtype=dtype)
    je = JitTextEncoder(enc, enc.init_params(jax.random.PRNGKey(0)))
    txt = je._fn.lower(
        je.params, jnp.zeros((2, 8), jnp.int32), jnp.full((2,), 8, jnp.int32),
        kernels_off=False,
    ).as_text()
    assert ("HIGHEST" in txt) == want_highest, "encoder program precision"


def test_warmup_and_predict_trace_identical_programs():
    """The cold-start promise: a program compiled by ``warmup()`` IS the
    program ``predict`` runs (same canonicalized module bytes), for an fp32
    model where the pipeline applies the HIGHEST-precision context."""
    import jax._src.cache_key as ck

    from sonar_tpu.inference_pipelines.utils import precision_context

    cfg = sonar_text_decoder_archs.get("toy")
    dec = ConditionalTransformerDecoder(cfg)  # fp32 default
    params = dec.init_params(jax.random.PRNGKey(0))
    rt = JitTextDecoder(dec, params)
    D = cfg.model_dim
    bc = BeamSearchConfig(beam_size=2, max_gen_len=2)
    args = (
        rt.params, jnp.zeros((2, 1, D), jnp.float32),
        jnp.zeros((2, 2), jnp.int32), jnp.asarray(1.0, jnp.float32),
        jnp.asarray(0.0, jnp.float32), jnp.asarray(1, jnp.int32),
    )

    fn = rt._build_beam_fn(bc, 2)
    # warmup path: no pipeline context active
    bare = fn.lower(*args, kernels_off=False)._lowering.stablehlo()
    # predict path: traced under the pipeline's precision_context
    with precision_context(dec.dtype):
        wrapped = fn.lower(*args, kernels_off=False)._lowering.stablehlo()
    a = ck._canonicalize_ir(bare, ck.IgnoreCallbacks.NO)
    b = ck._canonicalize_ir(wrapped, ck.IgnoreCallbacks.NO)
    assert a == b, "warmup would compile a program predict never reuses"


def test_helper_matches_reference_dtype_mapping():
    from sonar_tpu.ops.precision import matmul_precision_for

    seen = []
    for dt in (jnp.float32, jnp.float64, jnp.bfloat16, jnp.float16):
        with matmul_precision_for(dt):
            seen.append(jax.config.jax_default_matmul_precision)
    assert seen[0] == "highest" and seen[1] == "highest"
    assert seen[2] is None or seen[2] != "highest"
    assert np.asarray(1.0) is not None  # keep numpy import honest
