"""Speech->embedding and speech->text (reference README speech usage)."""

import sys

from sonar_tpu import SpeechToEmbeddingModelPipeline, SpeechToTextModelPipeline


def main(wav_paths):
    s2vec = SpeechToEmbeddingModelPipeline(encoder="sonar_speech_encoder_eng")
    emb = s2vec.predict(wav_paths)
    print("embeddings:", emb.shape)

    s2t = SpeechToTextModelPipeline(
        encoder="sonar_speech_encoder_eng",
        decoder="text_sonar_basic_decoder",
        tokenizer="text_sonar_basic_encoder",
    )
    print("transcripts:", s2t.predict(wav_paths, target_lang="eng_Latn"))


if __name__ == "__main__":
    main(sys.argv[1:] or ["audio.wav"])
