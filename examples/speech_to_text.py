"""Speech->embedding and speech->text (reference README speech usage).

Falls back to in-process toy models + a synthetic waveform offline."""

import sys

from sonar_tpu import SpeechToEmbeddingModelPipeline, SpeechToTextModelPipeline


def main(wav_paths):
    try:
        s2vec = SpeechToEmbeddingModelPipeline(encoder="sonar_speech_encoder_eng")
        s2t = SpeechToTextModelPipeline(
            encoder="sonar_speech_encoder_eng",
            decoder="text_sonar_basic_decoder",
            tokenizer="text_sonar_basic_encoder",
        )
        inputs = wav_paths
    except RuntimeError as e:  # offline, cache not seeded
        print(f"({e})\nfalling back to the toy in-process demo\n")
        import numpy as np

        from _toy import toy_speech_encoder, toy_text_decoder, toy_tokenizer

        tok = toy_tokenizer(["hello world"])
        enc = toy_speech_encoder()
        s2vec = SpeechToEmbeddingModelPipeline(encoder=enc)
        s2t = SpeechToTextModelPipeline(
            encoder=enc, decoder=toy_text_decoder(tok), tokenizer=tok
        )
        rng = np.random.default_rng(0)
        inputs = [(rng.normal(size=16000) * 0.1).astype(np.float32)]

    emb = s2vec.predict(inputs)
    print("embeddings:", emb.shape)
    print("transcripts:", s2t.predict(inputs, target_lang="eng_Latn",
                                      max_gen_len=16))


if __name__ == "__main__":
    main(sys.argv[1:] or ["audio.wav"])
