"""Run the micro-batching embedding server and fire a few requests at it.

Production deployments point ``EmbeddingServer`` at the real
``text_sonar_basic_encoder`` (int8 serving mode) and put it behind their
load balancer; offline this demo uses the toy fallback and self-tests the
round trip.
"""

from sonar_tpu import TextToEmbeddingModelPipeline
from sonar_tpu.client import SonarClient
from sonar_tpu.serving import EmbeddingServer

SENTENCES = ["My name is SONAR.", "I can embed sentences into vector space."]


def main():
    try:
        pipe = TextToEmbeddingModelPipeline(
            encoder="text_sonar_basic_encoder",
            tokenizer="text_sonar_basic_encoder",
        )
    except RuntimeError as e:  # offline, cache not seeded
        print(f"({e})\nfalling back to the toy in-process demo\n")
        from _toy import toy_text_encoder, toy_tokenizer

        pipe = TextToEmbeddingModelPipeline(
            encoder=toy_text_encoder(), tokenizer=toy_tokenizer(SENTENCES)
        )

    server = EmbeddingServer(pipe, max_wait_ms=5).start()
    host, port = server.address
    print(f"serving on http://{host}:{port}  "
          f"(POST /embed, GET /healthz, GET /metrics)")
    try:
        # SonarClient is the reference well-behaved caller: it honors the
        # server's 503 Retry-After load shedding with bounded backoff,
        # retries 504s, and chunks bulk inputs.
        with SonarClient(host, port) as client:
            emb = client.embed(SENTENCES, lang="eng_Latn")
            print(f"embedded {emb.shape[0]} sentences, dim {emb.shape[1]}")
            m = client.metrics()["embed"]
        print(f"metrics: {m['requests']} requests, {m['batches']} batches, "
              f"p50 {m['latency_p50_ms']} ms, shed {m['shed']}, "
              f"padding waste {m['encoder']['padding_waste']:.1%}")
    finally:
        server.stop()


if __name__ == "__main__":
    main()
