"""SONAR-TPU benchmark: text-encode throughput on one TPU chip.

Prints ONE final JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

plus ``#``-prefixed context lines covering the other two BASELINE.json
north-star metrics (speech-encode RTFx, p50 beam-decode latency), an MFU
line per metric (effective TFLOPS/TOPS from the analytic matmul op count in
``sonar_tpu/utils/flops.py`` against the public v5e peaks), and ONE
tunnel-health line (measured per-dispatch cost, D2H MB/s, probe-retry
count) — so every round's driver record is self-auditing: a throughput
swing can be attributed to chip vs tunnel from the record alone.

Baseline = the BASELINE.json north-star of 10,000 sentences/sec/chip for
SONAR ``basic`` text encoding on TPU v5e (the reference publishes no
throughput numbers; SURVEY §6).

Fault tolerance (the r3 record was lost to one transient tunnel error): the
top-level process is a supervisor that never touches the chip itself. It
(1) probes the device with a tiny jitted op in a subprocess under a 90 s
timeout (the CLAUDE.md rule), retrying with backoff; (2) runs the actual
measurement in a child process with a deadline and one full retry; (3) if
everything fails, emits a valid JSON line with ``"value": 0`` and an
``"error"`` field instead of a bare traceback. The child additionally wraps
each compile/measure phase in bounded retries for transient tunnel faults
(e.g. ``remote_compile: response body closed``).

Workload: the deployment path — a synthetic corpus with an NLLB-like
tokenized-length distribution (lognormal, median ~18 tokens, clipped to
[4, 126]) staged through the framework's token-budget dynamic bucketing and
static shape buckets, encoded by the full 24-layer 1024-d encoder in the
int8 serving mode (fused QKV + dynamic-activation int8; embedding cosine
0.9999 vs bf16 — within the >=0.999 parity budget).
``SONAR_TPU_BENCH_PRECISION=bf16`` switches precision;
``SONAR_TPU_BENCH_AUX=0`` skips the speech/decode aux metrics.

Timing is dependency-safe for the tunneled device: distinct batches, device
dispatch loop, full host materialization (see CLAUDE.md: identical-args
loops and bare ``block_until_ready`` mis-measure here).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

METRIC = "text_encode_sentences_per_sec_per_chip"
BASELINE_SENTS_PER_SEC = 10_000.0

# ---------------------------------------------------------------------------
# Supervisor (default entry): probe -> child -> guaranteed JSON line.
# ---------------------------------------------------------------------------

_PROBE_CODE = """
import jax, jax.numpy as jnp, numpy as np
x = jax.jit(lambda a: (a + 1.0).sum())(jnp.arange(64, dtype=jnp.float32))
assert abs(float(np.asarray(x)) - 2080.0) < 1.0, x
print("probe-ok", flush=True)
"""


def _probe_once(timeout: float = 90.0):
    """Tiny jitted op in a throwaway process; True iff the chip answered."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            timeout=timeout, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout:.0f}s"
    if r.returncode == 0 and "probe-ok" in r.stdout:
        return True, ""
    tail = (r.stderr or r.stdout or "").strip().splitlines()[-3:]
    return False, " | ".join(tail)[:400]


def _probe(attempts: int = 3):
    """Returns (ok, err, failed_probe_count) — the count feeds the
    tunnel-health line so a degraded-tunnel run is visible in the record."""
    err = ""
    for i in range(attempts):
        ok, err = _probe_once()
        if ok:
            return True, "", i
        wait = 15.0 * (i + 1)
        print(f"# chip probe failed (attempt {i + 1}/{attempts}): {err}; "
              f"retrying in {wait:.0f}s", flush=True)
        if i + 1 < attempts:
            time.sleep(wait)
    return False, err, attempts


def _emit_failure(reason: str) -> None:
    print(json.dumps({
        "metric": METRIC, "value": 0.0, "unit": "sentences/s",
        "vs_baseline": 0.0, "error": reason[:500],
    }), flush=True)


def supervise() -> int:
    deadline = float(os.environ.get("SONAR_TPU_BENCH_TIMEOUT", 3300))
    attempts = int(os.environ.get("SONAR_TPU_BENCH_ATTEMPTS", 2))
    last_err = "unknown"
    probe_failures = 0
    for attempt in range(attempts):
        ok, err, fails = _probe()
        probe_failures += fails
        if not ok:
            # Tunnel stalls have been observed to last several minutes
            # (CLAUDE.md): a failed probe burns this attempt and cools down
            # rather than giving up — the next attempt re-probes.
            last_err = f"tpu unreachable (tiny-op probe x3): {err}"
            print(f"# {last_err}; cooling down 120s "
                  f"(attempt {attempt + 1}/{attempts})", flush=True)
            if attempt + 1 < attempts:
                time.sleep(120.0)
            continue
        child_env = dict(
            os.environ,
            SONAR_TPU_BENCH_PROBE_RETRIES=str(probe_failures),
            SONAR_TPU_BENCH_ATTEMPT=str(attempt + 1),
        )
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=child_env,
        )
        timer = threading.Timer(deadline, proc.kill)
        timer.start()
        saw_json = False
        try:
            assert proc.stdout is not None
            for line in proc.stdout:
                print(line, end="", flush=True)
                if line.startswith("{"):
                    saw_json = True
            proc.wait()
        finally:
            timer.cancel()
        if saw_json:
            return 0
        last_err = (f"measurement child exited rc={proc.returncode} "
                    f"without a result (attempt {attempt + 1}/{attempts})")
        print(f"# {last_err}", flush=True)
    _emit_failure(last_err)
    return 0


# ---------------------------------------------------------------------------
# Measurement child (runs with --child; the only process that uses the chip).
# ---------------------------------------------------------------------------

def _with_retries(fn, what: str, attempts: int = 3, base_delay: float = 10.0):
    """Bounded retries for transient tunnel faults during a phase."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — tunnel faults are generic
            if i + 1 == attempts:
                raise
            print(f"# transient error in {what} "
                  f"(attempt {i + 1}/{attempts}): {type(e).__name__}: "
                  f"{str(e)[:200]}; retrying in {base_delay * (i + 1):.0f}s",
                  flush=True)
            time.sleep(base_delay * (i + 1))


def _setup_jax():
    import jax

    # Persistent XLA compile cache: the fine-grained bucket set below costs
    # ~20 shapes; first run compiles them once, every later run starts hot.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/sonar_tpu_xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


# Defaults chip-tuned (r2): 32k sentences amortize per-dispatch overhead as
# sustained serving would, and the 26-bucket set cuts padding waste
# 8.9% -> 4.8% (single-token granularity around the length mode); together
# 9.9k -> 10.5k sentences/s vs the r2-early 16k/17-bucket settings.
N_SENTENCES = int(os.environ.get("SONAR_TPU_BENCH_N", 32768))
BATCH_MAX_TOKENS = 8192
_BUCKET_SETS = {
    "fine17": (10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 32, 36, 40, 48, 64, 96,
               128),
    "fine26": (8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 22, 24, 26,
               28, 30, 32, 36, 40, 48, 56, 64, 80, 128),
}
# "dpK" (e.g. dp40) = exact DP-optimal K boundaries for the corpus length
# distribution (data/batcher.py optimal_len_buckets) — what a deployment
# serving a stationary traffic mix would tune.
_BUCKET_SPEC = os.environ.get("SONAR_TPU_BENCH_BUCKETS", "fine26")
if _BUCKET_SPEC not in _BUCKET_SETS and not (
    _BUCKET_SPEC.startswith("dp")
    and _BUCKET_SPEC[2:].isdigit()
    and int(_BUCKET_SPEC[2:]) >= 1
):
    raise ValueError(
        f"SONAR_TPU_BENCH_BUCKETS={_BUCKET_SPEC!r}: expected one of "
        f"{sorted(_BUCKET_SETS)} or 'dpK' (e.g. dp40)"
    )
LEN_BUCKETS = _BUCKET_SETS.get(_BUCKET_SPEC)
WARMUP_BATCHES = 6
VOCAB = 256_000


def synthetic_corpus(rng, n):
    """Tokenized lengths ~ lognormal (median ~18), FLORES-like sentences."""
    import numpy as np

    lens = np.clip(np.rint(rng.lognormal(mean=2.9, sigma=0.55, size=n)), 4, 126).astype(
        np.int32
    )
    return [rng.integers(4, VOCAB, size=int(l)).astype(np.int32) for l in lens]


def measure_text_encode() -> float:
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from sonar_tpu.inference_pipelines.text import JitTextEncoder
    from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs

    config = sonar_text_encoder_archs.get("basic")
    model = SonarTextEncoder(config, dtype=jnp.bfloat16)
    precision = os.environ.get("SONAR_TPU_BENCH_PRECISION", "int8")

    params = _with_retries(
        lambda: jax.jit(
            lambda key: jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), model.init_params(key)
            )
        )(jax.random.PRNGKey(0)),
        "param init compile",
    )
    # JitTextEncoder applies fuse_qkv/int8 and stacks same-shape batches into
    # one scanned dispatch of 8 (amortizes the per-dispatch round-trip).
    encoder = JitTextEncoder(
        model, params, fuse_qkv=True, quantize=precision == "int8",
        dispatch_stack=8,
    )

    # Static-shape batching: one fixed (batch, len) shape per length bucket,
    # batches filled completely — minimal padding waste AND bounded compiles.
    from sonar_tpu.data.batcher import StaticShapeBatcher, optimal_len_buckets

    len_buckets = LEN_BUCKETS
    if len_buckets is None:  # validated "dpK" spec
        probe = synthetic_corpus(np.random.default_rng(0), N_SENTENCES)
        len_buckets = optimal_len_buckets(
            [len(s) for s in probe], int(_BUCKET_SPEC[2:])
        )
    batcher = StaticShapeBatcher(
        pad_value=1, len_buckets=len_buckets,
        tokens_per_batch=BATCH_MAX_TOKENS,
    )
    # Five distinct corpora (same distribution, different seeds): the
    # tunneled chip shows ~±15% pass-to-pass noise, so the recorded value is
    # the median of five passes; identical inputs across passes would hit
    # the tunnel's content caching (CLAUDE.md), hence fresh data per pass.
    passes = []
    for seed in (0, 1, 2, 3, 4):
        corpus = synthetic_corpus(np.random.default_rng(seed), N_SENTENCES)
        passes.append(list(batcher.batches(corpus)))

    real = sum(int(b.seq_lens.sum()) for b in passes[0])
    padded = sum(b.seqs.size for b in passes[0])
    print(f"# padding waste: {(1 - real / padded) * 100:.1f}% "
          f"({len(set(b.seqs.shape for b in passes[0]))} shapes)", flush=True)

    # Warm every compiled shape (stacked + single per bucket) out of the
    # timed region: untimed full passes (compiles are minutes on a tunneled
    # chip; the persistent cache keeps later runs hot).
    for i, p in enumerate(passes):
        _with_retries(lambda p=p: encoder.encode_batches(p, materialize=False),
                      f"warmup pass {i}")

    # Chip throughput: every dispatch forced to full completion through a
    # per-result checksum (all elements consumed on device, 4 bytes cross the
    # link). Host materialization is timed separately below: this box reaches
    # the chip through a ~25 MB/s tunnel, so downloading the 64 MB of fp32
    # embeddings would measure the link, not the chip (production hosts
    # attach TPUs over PCIe, where the same transfer is ~4 ms).
    checksum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))

    def run_pass(batches):
        """Encode one pass, forcing full completion via ONE tiny download."""
        outs = encoder.encode_batches(batches, materialize=False)
        total, seen, sums = 0, set(), []
        for b, f in zip(batches, outs):
            total += b.true_batch
            arr = f[0] if isinstance(f, tuple) else f
            if id(arr) not in seen:
                seen.add(id(arr))
                sums.append(checksum(arr))
        np.asarray(jnp.stack(sums))  # one [n_dispatch] download
        return total

    for i, p in enumerate(passes):  # warm the checksum/stack shapes too
        _with_retries(lambda p=p: run_pass(p), f"checksum warmup pass {i}")

    from sonar_tpu.utils.flops import mfu, transformer_encoder_flops

    def pass_flops(batches):
        # Padded shapes = the work the chip executes; stacking same-shape
        # dispatches does not change the total.
        return sum(
            transformer_encoder_flops(
                config.model_dim, config.ffn_inner_dim,
                config.num_encoder_layers, b.seqs.shape[0], b.seqs.shape[1],
            )
            for b in batches
        )

    rates, tflops = [], []
    for batches in passes:
        t0 = time.perf_counter()
        total = run_pass(batches)
        dt = time.perf_counter() - t0
        rates.append(total / dt)
        tflops.append(pass_flops(batches) / dt / 1e12)

    eff = sorted(tflops)[len(tflops) // 2]
    print("# " + json.dumps({
        "metric": "text_encode_mfu",
        "value": round(mfu(eff * 1e12, precision), 3),
        "unit": f"fraction of v5e {precision} peak",
        "detail": f"{eff:.0f} effective T{'OPS' if precision == 'int8' else 'FLOPS'} "
                  f"(analytic matmul ops / median pass wall; attention stays "
                  f"bf16 in int8 mode, so int8-peak MFU is conservative)",
    }), flush=True)

    t0 = time.perf_counter()
    outs = encoder.encode_batches(passes[0])
    n0 = sum(o.shape[0] for o in outs)
    host_rate = n0 / (time.perf_counter() - t0)
    print(f"# host-delivery (incl. tunnel D2H at ~25 MB/s): {host_rate:.0f} "
          f"sentences/s", flush=True)
    print(f"# passes: {[round(r) for r in rates]}", flush=True)
    return sorted(rates)[len(rates) // 2]


def measure_speech_rtfx() -> None:
    """Speech-encode device RTFx, slope-timed (methodology of
    scripts/bench_speech_slope.py): jit(lax.scan) over fused fbank+Conformer
    forward at two scan lengths; per-batch device time is the slope, which
    cancels the tunnel's fixed per-dispatch cost."""
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from sonar_tpu.models.sonar_speech import (
        SonarSpeechEncoder,
        sonar_speech_encoder_archs,
    )
    from sonar_tpu.ops.fbank import FbankConfig, batched_fbank, num_frames

    B, SECONDS, SR = 8, 10, 16000
    I1, I2, PASSES = 2, 6, 3
    model = SonarSpeechEncoder(
        sonar_speech_encoder_archs.get("english"), dtype=jnp.bfloat16
    )
    params = _with_retries(
        lambda: jax.jit(lambda k: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), model.init_params(k)
        ))(jax.random.PRNGKey(0)),
        "speech param init",
    )
    rng = np.random.default_rng(0)
    waves = jnp.asarray(
        rng.normal(size=(B, SECONDS * SR)).astype(np.float32) * 0.1
    )
    fb_cfg = FbankConfig()
    max_frames = num_frames(SECONDS * SR, fb_cfg)
    lens_in = jnp.full((B,), SECONDS * SR, jnp.int32)

    def make(iters):
        @jax.jit
        def run(p, w):
            def body(carry, _):
                fb, _lens = batched_fbank(carry, lens_in, max_frames, fb_cfg)
                emb = model.apply(p, fb).sentence_embeddings
                mix = (emb.astype(jnp.float32).sum() * 1e-9).astype(carry.dtype)
                return carry + mix, None

            w, _ = jax.lax.scan(body, w, None, length=iters)
            return w[:2, :8]

        return run

    times = {}
    for iters in (I1, I2):
        run = make(iters)
        _with_retries(lambda r=run: np.asarray(r(params, waves)),
                      f"speech warmup scan{iters}")
        ts = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            np.asarray(run(params, waves))
            ts.append(time.perf_counter() - t0)
        times[iters] = sorted(ts)[len(ts) // 2]
    t = (times[I2] - times[I1]) / (I2 - I1)
    rtfx = B * SECONDS / t
    print("# " + json.dumps({
        "metric": "speech_encode_rtfx", "value": round(rtfx, 0),
        "unit": "x realtime/chip",
        "detail": f"slope-timed, B={B}x{SECONDS}s, {t * 1e3:.1f} ms/batch, "
                  f"english arch bf16",
    }), flush=True)

    from sonar_tpu.utils.flops import conformer_encoder_flops, mfu
    conf = model.config.conformer
    seq = max_frames // model.config.frontend.fbank_stride
    eff = conformer_encoder_flops(
        conf.model_dim, conf.ffn_inner_dim, conf.num_layers,
        conf.depthwise_kernel_size, B, seq,
    ) / t
    print("# " + json.dumps({
        "metric": "speech_encode_mfu",
        "value": round(mfu(eff, "bf16"), 3),
        "unit": "fraction of v5e bf16 peak",
        "detail": f"{eff / 1e12:.0f} effective TFLOPS (analytic Conformer "
                  f"matmul ops at seq={seq} / slope-timed batch device time)",
    }), flush=True)


def measure_decode_p50() -> None:
    """p50 beam-decode latency in the parity-exact serving mode: full
    generate_beam (prefill + while_loop + finalization as one program),
    per-step cost as the slope between two max_gen_lens, p50 wall over
    distinct-input passes at gen=32."""
    jax = _setup_jax()
    import numpy as np

    import jax.numpy as jnp

    from sonar_tpu.generation.beam_search import BeamSearchConfig
    from sonar_tpu.generation.decoder_runtime import JitTextDecoder
    from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

    B, K, G1, G2, PASSES = 64, 5, 8, 32, 5
    model = ConditionalTransformerDecoder(
        sonar_text_decoder_archs.get("basic"), dtype=jnp.bfloat16
    )
    params = _with_retries(
        lambda: jax.jit(lambda k: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), model.init_params(k)
        ))(jax.random.PRNGKey(0)),
        "decoder param init",
    )
    runtime = JitTextDecoder(model, params)
    rng = np.random.default_rng(0)
    times = {}
    for gen in (G1, G2):
        config = BeamSearchConfig(beam_size=K, max_gen_len=gen,
                                  min_gen_len=gen, approx_topk=False)
        mems = [rng.normal(size=(B, 1, 1024)).astype(np.float32)
                for _ in range(PASSES + 1)]
        _with_retries(
            lambda m=mems[0], c=config: runtime.generate_beam(m, [3, 256002], c),
            f"beam gen{gen} compile",
        )
        ts = []
        for m in mems[1:]:
            t0 = time.perf_counter()
            runtime.generate_beam(m, [3, 256002], config)
            ts.append(time.perf_counter() - t0)
        times[gen] = sorted(ts)[len(ts) // 2]
    step_ms = (times[G2] - times[G1]) / (G2 - G1) * 1e3
    print("# " + json.dumps({
        "metric": "beam_decode_p50_latency_ms", "value": round(times[G2] * 1e3, 1),
        "unit": "ms (B=64, K=5, gen=32, exact top-k)",
        "detail": f"{step_ms:.2f} ms/step slope, "
                  f"{B * G2 / times[G2]:.0f} tok/s, p50 of {PASSES} passes",
    }), flush=True)

    from sonar_tpu.utils.flops import decoder_step_flops, mfu
    dcfg = model.config
    eff = decoder_step_flops(
        dcfg.model_dim, dcfg.ffn_inner_dim, dcfg.num_decoder_layers,
        dcfg.vocab_info.size, B * K, cache_len=(G1 + G2) / 2,
    ) / (step_ms / 1e3)
    print("# " + json.dumps({
        "metric": "beam_decode_mfu",
        "value": round(mfu(eff, "bf16"), 3),
        "unit": "fraction of v5e bf16 peak",
        "detail": f"{eff / 1e12:.1f} effective TFLOPS per marginal step "
                  f"(B*K={B * K} rows; single-token decode is HBM-bound, "
                  f"so low MFU is expected — track the trend, not the level)",
    }), flush=True)


def measure_tunnel_health() -> None:
    """One tail line that lets a reader attribute chip vs tunnel: measured
    per-dispatch fixed cost, D2H bandwidth, and the supervisor's probe
    failure count for THIS run (the r4 record halved its host-delivery
    number with no way to tell a degraded tunnel from a regression)."""
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np

    tiny = jax.jit(lambda a: (a * 1.000001).sum())
    ident = jax.jit(lambda a: a * 1.000001)
    rng = np.random.default_rng(0)
    np.asarray(tiny(jnp.arange(128, dtype=jnp.float32)))  # warm compile
    warm = ident(jnp.asarray(rng.normal(size=(2_000_000,)).astype(np.float32)))
    np.asarray(warm)

    # Fixed per-dispatch round trip: tiny op, fresh host input each pass
    # (identical args hit the tunnel's content cache — CLAUDE.md).
    ts = []
    for i in range(9):
        x = jnp.arange(128, dtype=jnp.float32) + float(i)
        t0 = time.perf_counter()
        np.asarray(tiny(x))
        ts.append(time.perf_counter() - t0)
    dispatch_s = sorted(ts)[len(ts) // 2]

    # D2H bandwidth: time only the 8 MB download of an already-computed
    # result (distinct data per pass), net of the fixed dispatch cost.
    ds = []
    for _ in range(3):
        buf = jnp.asarray(rng.normal(size=(2_000_000,)).astype(np.float32))
        out = ident(buf)
        out.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(out)
        ds.append(time.perf_counter() - t0)
    d2h_s = sorted(ds)[len(ds) // 2]
    mb_per_s = 8.0 / max(d2h_s - dispatch_s, 1e-6)

    print("# " + json.dumps({
        "metric": "tunnel_health",
        "dispatch_ms": round(dispatch_s * 1e3, 1),
        "d2h_mb_per_s": round(mb_per_s, 1),
        "probe_retries": int(os.environ.get("SONAR_TPU_BENCH_PROBE_RETRIES", 0)),
        "child_attempt": int(os.environ.get("SONAR_TPU_BENCH_ATTEMPT", 1)),
        "detail": "healthy baseline on this box: ~30 ms dispatch, ~25 MB/s "
                  "D2H; far off -> read throughput deltas as tunnel, not chip",
    }), flush=True)


def child_main() -> None:
    try:
        measure_tunnel_health()
    except Exception as e:  # noqa: BLE001 — health line must not cost the run
        print(f"# tunnel health probe failed: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    sents_per_sec = measure_text_encode()

    if os.environ.get("SONAR_TPU_BENCH_AUX", "1") != "0":
        # Other two BASELINE.json north-star metrics, recorded every round so
        # a speech/decode regression can't hide (r3 verdict item 2). Failures
        # here must not cost the primary record.
        try:
            measure_speech_rtfx()
        except Exception as e:  # noqa: BLE001
            print(f"# speech aux failed: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        try:
            measure_decode_p50()
        except Exception as e:  # noqa: BLE001
            print(f"# decode aux failed: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": round(sents_per_sec, 1),
                "unit": "sentences/s",
                "vs_baseline": round(sents_per_sec / BASELINE_SENTS_PER_SEC, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    if "--child" in sys.argv:
        child_main()
    else:
        sys.exit(supervise())
