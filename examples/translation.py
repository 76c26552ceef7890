"""Text->text translation through the 1024-d bottleneck, plus
embedding->text reconstruction (reference README usage:84-118)."""

from sonar_tpu import (
    EmbeddingToTextModelPipeline,
    TextToEmbeddingModelPipeline,
    TextToTextModelPipeline,
)


def main():
    t2t = TextToTextModelPipeline(
        encoder="text_sonar_basic_encoder",
        decoder="text_sonar_basic_decoder",
        tokenizer="text_sonar_basic_encoder",
    )
    out = t2t.predict(
        ["Hello, my name is Paul", "I work as a teacher."],
        source_lang="eng_Latn",
        target_lang="fra_Latn",
    )
    print("eng->fra:", out)

    embed = TextToEmbeddingModelPipeline(
        encoder="text_sonar_basic_encoder", tokenizer="text_sonar_basic_encoder"
    )
    decode = EmbeddingToTextModelPipeline(
        decoder="text_sonar_basic_decoder", tokenizer="text_sonar_basic_encoder"
    )
    emb = embed.predict(["My name is SONAR."], source_lang="eng_Latn")
    print("roundtrip:", decode.predict(emb, target_lang="eng_Latn"))


if __name__ == "__main__":
    main()
