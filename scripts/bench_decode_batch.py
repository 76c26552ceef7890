"""Beam-decode throughput vs sentence batch size (wall + slope).

tok/s counts one generated token per sentence per step (B tokens/step).
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

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax.numpy as jnp

from sonar_tpu.generation.beam_search import BeamSearchConfig
from sonar_tpu.generation.decoder_runtime import JitTextDecoder
from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

K, GEN = 5, 32
I1, I2 = 8, 32
PASSES = 3


def main():
    print(f"devices: {jax.devices()}  K={K} gen={GEN}")
    model = ConditionalTransformerDecoder(
        sonar_text_decoder_archs.get("basic"), dtype=jnp.bfloat16
    )
    init = jax.jit(lambda k: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), model.init_params(k)))
    params = init(jax.random.PRNGKey(0))
    runtime = JitTextDecoder(model, params)
    rng = np.random.default_rng(0)
    for B in (32, 64, 128, 256):
        times = {}
        for gen in (I1, I2):
            config = BeamSearchConfig(beam_size=K, max_gen_len=gen,
                                      min_gen_len=gen, approx_topk=True)
            mems = [rng.normal(size=(B, 1, 1024)).astype(np.float32)
                    for _ in range(PASSES + 1)]
            runtime.generate_beam(mems[0], [3, 256002], config)
            ts = []
            for m in mems[1:]:
                t0 = time.perf_counter()
                runtime.generate_beam(m, [3, 256002], config)
                ts.append(time.perf_counter() - t0)
            times[gen] = sorted(ts)[len(ts) // 2]
        t = (times[I2] - times[I1]) / (I2 - I1)
        print(f"B={B:4d}: {t*1e3:6.2f} ms/step slope, "
              f"{B/t:7.0f} tok/s, wall gen32 {times[I2]*1e3:6.0f} ms "
              f"({B*GEN/times[I2]:.0f} tok/s incl. overhead)", flush=True)


if __name__ == "__main__":
    main()
