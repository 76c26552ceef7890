"""Text->text translation through the 1024-d bottleneck, plus
embedding->text reconstruction (reference README usage:84-118).

Falls back to in-process toy models offline (see examples/_toy.py)."""

from sonar_tpu import (
    EmbeddingToTextModelPipeline,
    TextToEmbeddingModelPipeline,
    TextToTextModelPipeline,
)

SENTENCES = ["Hello, my name is Paul", "I work as a teacher."]


def main():
    try:
        t2t = TextToTextModelPipeline(
            encoder="text_sonar_basic_encoder",
            decoder="text_sonar_basic_decoder",
            tokenizer="text_sonar_basic_encoder",
        )
        embed = TextToEmbeddingModelPipeline(
            encoder="text_sonar_basic_encoder",
            tokenizer="text_sonar_basic_encoder",
        )
        decode = EmbeddingToTextModelPipeline(
            decoder="text_sonar_basic_decoder",
            tokenizer="text_sonar_basic_encoder",
        )
    except RuntimeError as e:  # offline, cache not seeded
        print(f"({e})\nfalling back to the toy in-process demo\n")
        from _toy import toy_text_decoder, toy_text_encoder, toy_tokenizer

        tok = toy_tokenizer(SENTENCES + ["My name is SONAR."])
        enc = toy_text_encoder()
        dec = toy_text_decoder(tok)
        t2t = TextToTextModelPipeline(encoder=enc, decoder=dec, tokenizer=tok)
        embed = TextToEmbeddingModelPipeline(encoder=enc, tokenizer=tok)
        decode = EmbeddingToTextModelPipeline(decoder=dec, tokenizer=tok)

    out = t2t.predict(SENTENCES, source_lang="eng_Latn", target_lang="fra_Latn",
                      max_gen_len=16)
    print("eng->fra:", out)

    emb = embed.predict(["My name is SONAR."], source_lang="eng_Latn")
    print("roundtrip:", decode.predict(emb, target_lang="eng_Latn", max_gen_len=16))


if __name__ == "__main__":
    main()
