"""A/B decode p50 at small batch: bf16 vs int8 weights, one process.

At B=64 (N=320 rows) int8 decode lost: dynamic-quant overhead exceeded the
weight-byte savings. At B=8 (N=40) the step is weight-read-bound
(1.07 GB/step bf16), so the halved weight bytes may win.
"""

import os
from pathlib import Path
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sonar_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from sonar_tpu.generation.beam_search import BeamSearchConfig
from sonar_tpu.generation.decoder_runtime import JitTextDecoder
from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

K, GEN, ITERS = 5, 32, 7


def measure(runtime, B, rng):
    config = BeamSearchConfig(beam_size=K, max_gen_len=GEN, min_gen_len=GEN,
                              approx_topk=True)
    mems = [rng.normal(size=(B, 1, 1024)).astype(np.float32)
            for _ in range(ITERS + 1)]
    runtime.generate_beam(mems[0], [3, 256002], config)
    ts = []
    for m in mems[1:]:
        t0 = time.perf_counter()
        runtime.generate_beam(m, [3, 256002], config)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    print(f"devices: {jax.devices()}")
    model = ConditionalTransformerDecoder(
        sonar_text_decoder_archs.get("basic"), dtype=jnp.bfloat16
    )
    init = jax.jit(lambda k: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), model.init_params(k)))
    params = init(jax.random.PRNGKey(0))
    rt16 = JitTextDecoder(model, params)
    rt8 = JitTextDecoder(model, params, quantize=True)
    rng = np.random.default_rng(0)
    for B in (1, 8, 64):
        t16 = measure(rt16, B, rng)
        t8 = measure(rt8, B, rng)
        t16b = measure(rt16, B, rng)
        t8b = measure(rt8, B, rng)
        print(f"B={B:3d}: bf16 p50 {min(t16, t16b)*1e3:6.1f} ms | "
              f"int8 p50 {min(t8, t8b)*1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
